/**
 * HeyBuddy browser orchestrator.
 *
 * Frame loop per batch interval (default 120 ms): mel spectrogram ->
 * speech embeddings -> sliding 16-embedding buffer -> VAD gate -> wake-word
 * heads (chunked concurrency) -> callbacks, plus recording-buffer management
 * with a detection refractory period. Capability parity with the reference
 * runtime's public API: `new HeyBuddy(options)` with onRecording /
 * onProcessed / onDetected / onSpeechStart / onSpeechEnd subscriptions.
 *
 * Model artifacts come from this framework:
 *   scripts/export_browser_assets.py         -> mel-spectrogram.onnx, speech-embedding.onnx
 *   heybuddy convert <checkpoint> <name>.onnx -> wake-word head(s)
 */

import { AudioBatcher } from "./audio.js";
import { EnergyVAD, MelSpectrogram, SileroVAD, SpeechEmbedding, WakeWord } from "./models.js";

export class HeyBuddy {
  /**
   * @param {object} options
   *   modelPath: string | string[] — wake-word head ONNX path(s)
   *   assetPath: directory containing mel-spectrogram.onnx / speech-embedding.onnx
   *   threshold: detection threshold (default 0.5)
   *   batchSeconds / batchIntervalSeconds: audio batching geometry
   *   embeddingFrames: classifier context (default 16)
   *   wakeWordThreads: concurrent head executions per frame (default 4)
   *   debounceSeconds: detection refractory period (default 2)
   *   consecutiveFrames: frames a head must stay above threshold before
   *     firing (default 1 = fire on any frame, the reference behavior;
   *     2 suppresses single-frame false-positive spikes — mirrors the
   *     Python runtime's ConsecutiveGate)
   *   recordingMaxSeconds: recording buffer cap (default 10)
   */
  constructor(options = {}) {
    const assetPath = (options.assetPath ?? "models").replace(/\/$/, "");
    const modelPaths = Array.isArray(options.modelPath)
      ? options.modelPath
      : [options.modelPath ?? `${assetPath}/wake-word.onnx`];

    this.spectrogram = new MelSpectrogram(
      options.spectrogramModelPath ?? `${assetPath}/mel-spectrogram.onnx`,
      options,
    );
    this.embedding = new SpeechEmbedding(
      options.embeddingModelPath ?? `${assetPath}/speech-embedding.onnx`,
      options,
    );
    // VAD: the real Silero model when a path is provided (the original
    // silero-vad.onnx works directly under onnxruntime-web), else the
    // dependency-free energy detector.
    this.vad = options.vadModelPath
      ? new SileroVAD(options.vadModelPath, options)
      : new EnergyVAD(options);
    this.wakeWords = modelPaths.map(
      (path) => new WakeWord(path, { ...options, threshold: options.threshold ?? 0.5 }),
    );
    // Colliding head names (same basename, or one options.name spread into
    // every head) would overwrite each other's scores and run counters.
    const seenNames = new Set();
    for (const head of this.wakeWords) {
      let name = head.name;
      for (let k = 2; seenNames.has(name); k++) name = `${head.name}#${k}`;
      head.name = name;
      seenNames.add(name);
    }

    this.threshold = options.threshold ?? 0.5;
    this.embeddingFrames = options.embeddingFrames ?? 16;
    this.wakeWordThreads = options.wakeWordThreads ?? 4;
    this.debounceSeconds = options.debounceSeconds ?? 2.0;
    this.consecutiveFrames = options.consecutiveFrames ?? 1;
    this._aboveThresholdRuns = {};
    this.recordingMaxSeconds = options.recordingMaxSeconds ?? 10.0;
    this.sampleRate = 16000;

    this.batcher = new AudioBatcher({
      batchSeconds: options.batchSeconds ?? 1.08,
      batchIntervalSeconds: options.batchIntervalSeconds ?? 0.12,
      onBatch: (window, newest) => this._enqueue(window, newest),
    });

    this.embeddingBuffer = [];
    this.recording = false;
    this.recordingChunks = [];
    this.lastDetectionTime = -Infinity;
    this.listening = false;
    this.frameTimeEma = 0;
    this.frameIntervalEma = 0;
    this._lastFrameAt = 0;
    this._busy = false;
    this._queued = null;

    this._callbacks = {
      recording: [],
      processed: [],
      detected: [],
      speechstart: [],
      speechend: [],
    };
    this.vad.onSpeechStart = () => this._emit("speechstart");
    this.vad.onSpeechEnd = () => {
      this._emit("speechend");
      if (this.recording) this._dispatchRecording();
    };
  }

  onRecording(cb) { this._callbacks.recording.push(cb); return this; }
  onProcessed(cb) { this._callbacks.processed.push(cb); return this; }
  onDetected(cb) { this._callbacks.detected.push(cb); return this; }
  onSpeechStart(cb) { this._callbacks.speechstart.push(cb); return this; }
  onSpeechEnd(cb) { this._callbacks.speechend.push(cb); return this; }

  _emit(kind, payload) {
    for (const cb of this._callbacks[kind]) {
      try { cb(payload); } catch (err) { console.error(`heybuddy ${kind} callback`, err); }
    }
  }

  async start() {
    await Promise.all([
      this.spectrogram.load(),
      this.embedding.load(),
      ...(this.vad.load ? [this.vad.load()] : []),
      ...this.wakeWords.map((w) => w.load()),
    ]);
    await this.batcher.start();
    this.listening = true;
    return this;
  }

  async stop() {
    this.listening = false;
    await this.batcher.stop();
    // Reset per-session state so a later start() doesn't score (or record)
    // leftovers from before the stop.
    this.embeddingBuffer = [];
    this._aboveThresholdRuns = {};
    this._busy = false;
    this._queued = null;
    this.recording = false;
    this.recordingChunks = [];
    if (this.vad.reset) this.vad.reset();
    else { this.vad.speaking = false; this.vad.silentFrames = 0; }
  }

  _enqueue(window, newest) {
    // Drop-oldest backpressure: if a frame is still processing, keep only the
    // most recent batch.
    if (this._busy) { this._queued = [window, newest]; return; }
    this._busy = true;
    this.process(window, newest)
      .catch((err) => console.error("heybuddy frame failed", err))
      .finally(() => {
        this._busy = false;
        if (this._queued) {
          const [w, n] = this._queued;
          this._queued = null;
          this._enqueue(w, n);
        }
      });
  }

  /** One processing frame (reference loop semantics, hey-buddy.ts:382-469). */
  async process(window, newest) {
    const start = performance.now();
    if (this._lastFrameAt > 0) {
      const interval = start - this._lastFrameAt;
      this.frameIntervalEma = this.frameIntervalEma === 0
        ? interval : 0.1 * interval + 0.9 * this.frameIntervalEma;
    }
    this._lastFrameAt = start;

    const spectrogram = await this.spectrogram.execute(window);
    const embeddings = await this.embedding.execute(spectrogram);
    // Push ALL embeddings from this 1.08 s window (4 at stride 8). The frame
    // interval (0.12 s = 1920 samples) equals the training pipeline's
    // audio-window stride, so a 16-deep buffer of 4-embedding groups exactly
    // reproduces the training feature layout (ops/windows.py start plan).
    for (const emb of embeddings) {
      this.embeddingBuffer.push(emb);
    }
    if (this.embeddingBuffer.length > this.embeddingFrames) {
      this.embeddingBuffer = this.embeddingBuffer.slice(-this.embeddingFrames);
    }

    const speaking = await this.vad.update(newest);
    if (this.recording) {
      this.recordingChunks.push(newest.slice());
      const total = this.recordingChunks.reduce((acc, c) => acc + c.length, 0);
      if (total > this.recordingMaxSeconds * this.sampleRate) this._dispatchRecording();
    }

    const scores = {};
    if (speaking && this.embeddingBuffer.length >= this.embeddingFrames) {
      await this._checkWakeWords(scores);
    } else {
      for (const head of this.wakeWords) {
        scores[head.name] = head.lastProbability = 0;
        this._aboveThresholdRuns[head.name] = 0;
      }
    }

    this.frameTimeEma = this.frameTimeEma === 0
      ? performance.now() - start
      : 0.1 * (performance.now() - start) + 0.9 * this.frameTimeEma;

    this._emit("processed", {
      listening: this.listening,
      recording: this.recording,
      speech: speaking,
      wakeWords: scores,
      frameTime: this.frameTimeEma,
      frameInterval: this.frameIntervalEma,
    });
  }

  async _checkWakeWords(scores) {
    for (let i = 0; i < this.wakeWords.length; i += this.wakeWordThreads) {
      const chunk = this.wakeWords.slice(i, i + this.wakeWordThreads);
      const probs = await Promise.all(chunk.map((w) => w.execute(this.embeddingBuffer)));
      chunk.forEach((head, j) => {
        scores[head.name] = probs[j];
        // Same semantics as the Python ConsecutiveGate (runtime/detection.py):
        // inclusive threshold, and the run resets after firing so a sustained
        // activation needs a fresh run of N before it can re-fire. Each head
        // gates on its own calibrated threshold.
        if (probs[j] >= (head.threshold ?? this.threshold)) {
          const run = (this._aboveThresholdRuns[head.name] ?? 0) + 1;
          this._aboveThresholdRuns[head.name] = run;
          if (run >= this.consecutiveFrames) {
            this._aboveThresholdRuns[head.name] = 0;
            this._onDetection(head.name, probs[j]);
          }
        } else {
          this._aboveThresholdRuns[head.name] = 0;
        }
      });
    }
  }

  _onDetection(name, probability) {
    const now = performance.now() / 1000;
    if (now - this.lastDetectionTime < this.debounceSeconds) return;
    this.lastDetectionTime = now;
    if (!this.recording) {
      this.recording = true;
      this.recordingChunks = [];
    }
    this._emit("detected", { name, probability });
  }

  _dispatchRecording() {
    if (!this.recordingChunks.length) { this.recording = false; return; }
    const total = this.recordingChunks.reduce((acc, c) => acc + c.length, 0);
    const audio = new Float32Array(total);
    let offset = 0;
    for (const chunk of this.recordingChunks) { audio.set(chunk, offset); offset += chunk.length; }
    this.recording = false;
    this.recordingChunks = [];
    this._emit("recording", audio);
  }
}

export default HeyBuddy;
