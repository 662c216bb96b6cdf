// Type declarations for the heybuddy-tpu-web UMD bundle.
export interface ProcessedFrame {
  listening: boolean;
  recording: boolean;
  speech: boolean;
  wakeWords: Record<string, number>;
  frameTime: number;
  frameInterval: number;
}
export interface Detection { name: string; probability: number; }
export interface HeyBuddyOptions {
  modelPath?: string | string[];
  assetPath?: string;
  vadModelPath?: string;
  spectrogramModelPath?: string;
  embeddingModelPath?: string;
  threshold?: number;
  batchSeconds?: number;
  batchIntervalSeconds?: number;
  embeddingFrames?: number;
  wakeWordThreads?: number;
  debounceSeconds?: number;
  /** Frames a head must stay above threshold before firing (default 1). */
  consecutiveFrames?: number;
  recordingMaxSeconds?: number;
  executionProviders?: string[];
  positiveThreshold?: number;
  negativeThreshold?: number;
  silentFramesToStop?: number;
  ort?: unknown;
}
export declare class HeyBuddy {
  constructor(options?: HeyBuddyOptions);
  start(): Promise<this>;
  stop(): Promise<void>;
  onRecording(cb: (audio: Float32Array) => void): this;
  onProcessed(cb: (frame: ProcessedFrame) => void): this;
  onDetected(cb: (detection: Detection) => void): this;
  onSpeechStart(cb: () => void): this;
  onSpeechEnd(cb: () => void): this;
  listening: boolean;
  recording: boolean;
  frameTimeEma: number;
  frameIntervalEma: number;
}
export declare class SileroVAD {
  constructor(modelPath: string, options?: HeyBuddyOptions);
  probability(audio: Float32Array): Promise<number>;
  update(audio: Float32Array): Promise<boolean>;
  reset(): void;
  speaking: boolean;
}
export declare class EnergyVAD {
  constructor(options?: HeyBuddyOptions);
  probability(audio: Float32Array): number;
  update(audio: Float32Array): boolean;
  speaking: boolean;
}
export declare class MutexLock {
  acquire(): Promise<() => void>;
  runExclusive<T>(fn: () => Promise<T> | T): Promise<T>;
  readonly locked: boolean;
  readonly pending: number;
}
export default HeyBuddy;
