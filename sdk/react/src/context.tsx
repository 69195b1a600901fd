/**
 * React context for the zelana client.
 *
 * Mirror of the reference's sdk/react/src/context.tsx capability: a
 * provider that owns one ZelanaClient instance (and optional signer) and
 * exposes it to the hooks in hooks.ts. Built on this repo's typed client
 * (sdk/typescript/src/zelana.ts), which mirrors the tested Python
 * zelana_tpu/sdk/client.py.
 */

import {
  createContext,
  createElement,
  useContext,
  useMemo,
  type ReactNode,
} from "react";
import { ZelanaClient, type Signer } from "@zelana/tpu-client";

export interface ZelanaContextValue {
  client: ZelanaClient;
  /** Poll interval used by the query hooks (ms). */
  refreshIntervalMs: number;
}

const ZelanaContext = createContext<ZelanaContextValue | null>(null);

export interface ZelanaProviderProps {
  /** Sequencer HTTP base URL, e.g. http://localhost:8899 */
  endpoint: string;
  signer?: Signer;
  refreshIntervalMs?: number;
  children?: ReactNode;
}

export function ZelanaProvider({
  endpoint,
  signer,
  refreshIntervalMs = 2000,
  children,
}: ZelanaProviderProps) {
  const value = useMemo<ZelanaContextValue>(
    () => ({
      client: new ZelanaClient(endpoint, signer),
      refreshIntervalMs,
    }),
    [endpoint, signer, refreshIntervalMs],
  );
  return createElement(ZelanaContext.Provider, { value }, children);
}

export function useZelanaContext(): ZelanaContextValue {
  const ctx = useContext(ZelanaContext);
  if (!ctx) {
    throw new Error("useZelanaContext must be used inside <ZelanaProvider>");
  }
  return ctx;
}
