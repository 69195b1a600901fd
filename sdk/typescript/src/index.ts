export { ApiClient, ApiError, fromHex, toHex } from "./client";
export {
  Signer,
  ZelanaClient,
  signerFromPkcs8,
  transferSigningMessage,
  withdrawSigningMessage,
} from "./zelana";
export * from "./types";
export * from "./utils";
export * from "./shielded";
export * from "./encryption";
export * from "./keypair";
export * from "./prover";
