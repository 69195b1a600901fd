/**
 * React hooks over the zelana sequencer API.
 *
 * Mirror of the reference's sdk/react/src/hooks.ts surface (useZelana,
 * useHealth, useAccount, useBalance, useStateRoots, useBatchStatus,
 * useStats, useTransfer, useWithdraw, useTransaction,
 * useWaitForTransaction, useBatches, useTransactions), implemented
 * against this repo's typed client (tested Python twin:
 * zelana_tpu/sdk/client.py). Query hooks poll at the provider's
 * refreshIntervalMs; mutation hooks expose {mutate, data, error, loading}.
 */

import { useCallback, useEffect, useRef, useState } from "react";
import type {
  AccountState,
  BatchRecord,
  PipelineStats,
  StateRoots,
  SubmitResult,
  TxRecord,
  ZelanaClient,
} from "@zelana/tpu-client";
import { useZelanaContext } from "./context";

export interface UseQueryResult<T> {
  data: T | null;
  error: Error | null;
  loading: boolean;
  refetch: () => void;
}

export interface UseMutationResult<TData, TVariables> {
  mutate: (variables: TVariables) => Promise<TData>;
  data: TData | null;
  error: Error | null;
  loading: boolean;
  reset: () => void;
}

export function useZelana(): ZelanaClient {
  return useZelanaContext().client;
}

function useQuery<T>(
  fetcher: (client: ZelanaClient) => Promise<T>,
  deps: unknown[],
  poll = true,
): UseQueryResult<T> {
  const { client, refreshIntervalMs } = useZelanaContext();
  const [data, setData] = useState<T | null>(null);
  const [error, setError] = useState<Error | null>(null);
  const [loading, setLoading] = useState(true);
  const [tick, setTick] = useState(0);
  const alive = useRef(true);

  useEffect(() => {
    alive.current = true;
    let timer: ReturnType<typeof setTimeout> | undefined;
    const run = async () => {
      try {
        const result = await fetcher(client);
        if (!alive.current) return;
        setData(result);
        setError(null);
      } catch (e) {
        if (!alive.current) return;
        setError(e instanceof Error ? e : new Error(String(e)));
      } finally {
        if (alive.current) {
          setLoading(false);
          if (poll) timer = setTimeout(run, refreshIntervalMs);
        }
      }
    };
    void run();
    return () => {
      alive.current = false;
      if (timer !== undefined) clearTimeout(timer);
    };
    // eslint-disable-next-line react-hooks/exhaustive-deps
  }, [client, refreshIntervalMs, tick, ...deps]);

  const refetch = useCallback(() => setTick((t) => t + 1), []);
  return { data, error, loading, refetch };
}

function useMutation<TData, TVariables>(
  runner: (client: ZelanaClient, variables: TVariables) => Promise<TData>,
): UseMutationResult<TData, TVariables> {
  const { client } = useZelanaContext();
  const [data, setData] = useState<TData | null>(null);
  const [error, setError] = useState<Error | null>(null);
  const [loading, setLoading] = useState(false);

  const mutate = useCallback(
    async (variables: TVariables) => {
      setLoading(true);
      setError(null);
      try {
        const result = await runner(client, variables);
        setData(result);
        return result;
      } catch (e) {
        const err = e instanceof Error ? e : new Error(String(e));
        setError(err);
        throw err;
      } finally {
        setLoading(false);
      }
    },
    [client, runner],
  );

  const reset = useCallback(() => {
    setData(null);
    setError(null);
    setLoading(false);
  }, []);

  return { mutate, data, error, loading, reset };
}

// -- queries ---------------------------------------------------------------

export function useHealth(): UseQueryResult<{ status: string }> {
  return useQuery((c) => c.api.health(), []);
}

export function useAccount(pubkey?: Uint8Array): UseQueryResult<AccountState> {
  return useQuery(
    (c) => c.api.getAccount(pubkey ?? c.pubkey),
    [pubkey ? Array.from(pubkey).join(",") : "signer"],
  );
}

export function useBalance(pubkey?: Uint8Array): {
  balance: number | null;
  error: Error | null;
  loading: boolean;
  refetch: () => void;
} {
  const { data, error, loading, refetch } = useAccount(pubkey);
  return { balance: data?.balance ?? null, error, loading, refetch };
}

export function useStateRoots(): UseQueryResult<StateRoots> {
  return useQuery((c) => c.api.getStateRoots(), []);
}

export function useBatchStatus(): UseQueryResult<Record<string, unknown>> {
  return useQuery((c) => c.api.getBatchStatus(), []);
}

export function useStats(): UseQueryResult<PipelineStats> {
  return useQuery((c) => c.api.getStats(), []);
}

export function useTransaction(
  txHash: string | null,
): UseQueryResult<TxRecord | null> {
  return useQuery(
    async (c) => (txHash ? c.api.getTransaction(txHash) : null),
    [txHash],
  );
}

export function useBatches(limit = 20): UseQueryResult<BatchRecord[]> {
  return useQuery((c) => c.api.listBatches(limit), [limit]);
}

export function useTransactions(limit = 20): UseQueryResult<TxRecord[]> {
  return useQuery((c) => c.api.listTransactions(limit), [limit]);
}

// -- mutations -------------------------------------------------------------

export interface TransferVariables {
  to: Uint8Array;
  amount: number;
  nonce?: number;
}

export function useTransfer(): UseMutationResult<SubmitResult, TransferVariables> {
  return useMutation((c, v: TransferVariables) =>
    c.transfer(v.to, v.amount, v.nonce),
  );
}

export interface WithdrawVariables {
  toL1Address: Uint8Array;
  amount: number;
  nonce?: number;
  fast?: boolean;
}

export function useWithdraw(): UseMutationResult<SubmitResult, WithdrawVariables> {
  return useMutation((c, v: WithdrawVariables) =>
    v.fast
      ? c.fastWithdraw(v.toL1Address, v.amount, v.nonce)
      : c.withdraw(v.toL1Address, v.amount, v.nonce),
  );
}

// -- pollers ---------------------------------------------------------------

export type TxWaitStatus = "waiting" | "finalized" | "timeout" | "error";

export function useWaitForTransaction(
  txHash: string | null,
  timeoutMs = 60_000,
): { status: TxWaitStatus; error: Error | null } {
  const { client, refreshIntervalMs } = useZelanaContext();
  const [status, setStatus] = useState<TxWaitStatus>("waiting");
  const [error, setError] = useState<Error | null>(null);

  useEffect(() => {
    if (!txHash) return;
    setStatus("waiting");
    setError(null);
    let stop = false;
    const deadline = Date.now() + timeoutMs;
    const poll = async () => {
      while (!stop) {
        try {
          const tx = await client.api.getTransaction(txHash);
          if (stop) return;
          if (tx?.status === "finalized") {
            setStatus("finalized");
            return;
          }
        } catch (e) {
          if (stop) return;
          setStatus("error");
          setError(e instanceof Error ? e : new Error(String(e)));
          return;
        }
        if (Date.now() > deadline) {
          setStatus("timeout");
          return;
        }
        await new Promise((r) => setTimeout(r, refreshIntervalMs));
      }
    };
    void poll();
    return () => {
      stop = true;
    };
  }, [client, txHash, timeoutMs, refreshIntervalMs]);

  return { status, error };
}
