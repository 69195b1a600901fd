export {
  ZelanaProvider,
  useZelanaContext,
  type ZelanaContextValue,
  type ZelanaProviderProps,
} from "./context";
export * from "./hooks";
