(function (root, factory) {
  if (typeof module === "object" && typeof module.exports === "object") {
    module.exports = factory();
  } else if (typeof define === "function" && define.amd) {
    define([], factory);
  } else {
    root.HeyBuddy = factory();
  }
})(typeof self !== "undefined" ? self : this, function () {
  "use strict";
  // ---- src/mutex.js ------------------------------------------------
/**
 * Async mutual exclusion for the heybuddy-tpu browser runtime.
 *
 * Reference parity: src/ts/src/mutex.ts (a promise-chain MutexLock). This
 * implementation is queue-based instead: waiters resolve strictly FIFO, a
 * `locked` probe is available, and `runExclusive` scopes the critical
 * section so a thrown callback can never leak a held lock.
 *
 * Usage:
 *   const lock = new MutexLock();
 *   const release = await lock.acquire();
 *   try { ... } finally { release(); }
 * or:
 *   await lock.runExclusive(async () => { ... });
 */

class MutexLock {
  constructor() {
    this._held = false;
    this._waiters = [];
  }

  /** Whether the lock is currently held. */
  get locked() {
    return this._held;
  }

  /** Number of pending acquirers (excluding the holder). */
  get pending() {
    return this._waiters.length;
  }

  /**
   * Acquire the lock. Resolves with an idempotent release function once the
   * lock is held; callers queue FIFO.
   *
   * @returns {Promise<() => void>}
   */
  acquire() {
    return new Promise((resolve) => {
      const grant = () => {
        this._held = true;
        let released = false;
        resolve(() => {
          if (released) return;
          released = true;
          this._release();
        });
      };
      if (this._held) {
        this._waiters.push(grant);
      } else {
        grant();
      }
    });
  }

  /**
   * Run `fn` while holding the lock, releasing it on return or throw.
   *
   * @param {() => (Promise<any>|any)} fn
   * @returns {Promise<any>} `fn`'s result.
   */
  async runExclusive(fn) {
    const release = await this.acquire();
    try {
      return await fn();
    } finally {
      release();
    }
  }

  _release() {
    const next = this._waiters.shift();
    if (next) {
      // Hand off directly: the lock stays held, the next waiter owns it.
      next();
    } else {
      this._held = false;
    }
  }
}


  // ---- src/audio.js ------------------------------------------------
/**
 * Microphone capture and batching for the heybuddy-tpu browser runtime.
 *
 * getUserMedia -> AudioWorklet (inline Blob module) resampling to 16 kHz in
 * 20 ms frames -> main-thread ring buffer that emits a sliding
 * `batchSeconds` window every `batchIntervalSeconds`.
 */

const WORKLET_SOURCE = `
class HeyBuddyCaptureProcessor extends AudioWorkletProcessor {
  constructor() {
    super();
    this.targetRate = 16000;
    this.frameSamples = 320; // 20 ms at 16 kHz
    this.pending = new Float32Array(0);
    this.readPos = 0.0;
  }

  process(inputs) {
    const channel = inputs[0] && inputs[0][0];
    if (!channel || channel.length === 0) return true;

    // Append the new source-rate samples.
    const merged = new Float32Array(this.pending.length + channel.length);
    merged.set(this.pending);
    merged.set(channel, this.pending.length);
    this.pending = merged;

    // Linear resample sampleRate -> 16 kHz and flush whole 20 ms frames.
    const ratio = sampleRate / this.targetRate;
    const available = Math.floor((this.pending.length - 1 - this.readPos) / ratio);
    if (available >= this.frameSamples) {
      const frames = Math.floor(available / this.frameSamples);
      for (let f = 0; f < frames; f++) {
        const out = new Float32Array(this.frameSamples);
        for (let i = 0; i < this.frameSamples; i++) {
          const pos = this.readPos + i * ratio;
          const lower = Math.floor(pos);
          const frac = pos - lower;
          out[i] = this.pending[lower] * (1 - frac) + this.pending[lower + 1] * frac;
        }
        this.port.postMessage(out, [out.buffer]);
        this.readPos += this.frameSamples * ratio;
      }
      const keepFrom = Math.floor(this.readPos);
      this.pending = this.pending.slice(keepFrom);
      this.readPos -= keepFrom;
    }
    return true;
  }
}
registerProcessor("heybuddy-capture", HeyBuddyCaptureProcessor);
`;

class AudioBatcher {
  /**
   * @param {object} options
   *   batchSeconds: sliding window length fed to the pipeline (default 1.08 s)
   *   batchIntervalSeconds: emission period (default 0.12 s)
   *   onBatch(Float32Array window, Float32Array newest) callback
   */
  constructor(options = {}) {
    this.sampleRate = 16000;
    this.batchSeconds = options.batchSeconds ?? 1.08;
    this.batchIntervalSeconds = options.batchIntervalSeconds ?? 0.12;
    this.onBatch = options.onBatch ?? null;
    this.windowSamples = Math.round(this.batchSeconds * this.sampleRate);
    this.intervalSamples = Math.round(this.batchIntervalSeconds * this.sampleRate);
    this.ring = new Float32Array(this.windowSamples);
    this.sinceEmit = 0;
    this.filled = 0;
    this.context = null;
    this.stream = null;
    this.node = null;
  }

  push(frame) {
    const n = frame.length;
    this.ring.copyWithin(0, n);
    this.ring.set(frame, this.windowSamples - n);
    this.filled = Math.min(this.filled + n, this.windowSamples);
    this.sinceEmit += n;
    if (this.sinceEmit >= this.intervalSamples && this.filled >= this.windowSamples) {
      // `newest` is the FULL audio since the last emission (the interval,
      // ~1920 samples) — not just the final 20 ms worklet frame. Consumers
      // use it for VAD and recording capture; passing one frame gave them
      // 1/6 of the stream (recordings came out gap-spliced).
      const newest = this.ring.slice(
        Math.max(this.windowSamples - this.sinceEmit, 0),
      );
      this.sinceEmit = 0;
      if (this.onBatch) {
        this.onBatch(this.ring.slice(), newest);
      }
    }
  }

  reset() {
    this.ring.fill(0);
    this.filled = 0;
    this.sinceEmit = 0;
  }

  async start() {
    this.reset();
    this.stream = await navigator.mediaDevices.getUserMedia({
      audio: { echoCancellation: true, noiseSuppression: true },
    });
    this.context = new AudioContext();
    if (this.context.state === "suspended") {
      // Outside a user gesture the context starts suspended and the worklet
      // silently never runs.
      await this.context.resume();
    }
    const blob = new Blob([WORKLET_SOURCE], { type: "application/javascript" });
    const url = URL.createObjectURL(blob);
    await this.context.audioWorklet.addModule(url);
    URL.revokeObjectURL(url);
    const source = this.context.createMediaStreamSource(this.stream);
    this.node = new AudioWorkletNode(this.context, "heybuddy-capture");
    this.node.port.onmessage = (event) => this.push(event.data);
    source.connect(this.node);
    return this;
  }

  async stop() {
    if (this.node) this.node.disconnect();
    if (this.stream) this.stream.getTracks().forEach((track) => track.stop());
    if (this.context) await this.context.close();
    this.node = this.stream = this.context = null;
    // Clear buffered audio so a later start() doesn't emit windows that are
    // mostly the previous session's audio.
    this.reset();
  }
}

  // ---- src/models.js -----------------------------------------------
/**
 * Model wrappers for the heybuddy-tpu browser runtime.
 *
 * Runs the framework's exported ONNX graphs (scripts/export_browser_assets.py)
 * with onnxruntime-web. Capability parity with the reference runtime's model
 * layer (mel-spectrogram, speech-embedding, VAD, wake-word heads) — built for
 * this framework's artifacts: the mel graph bakes in the log scaling, the
 * embedding graph takes [batch, 76, 32] windows, and VAD is an in-JS adaptive
 * energy detector matching heybuddy_tpu.models.vad.EnergyVAD.
 */

/** Resolve the onnxruntime-web namespace (global script tag or dynamic import). */
async function resolveOrt(ortOverride = null) {
  if (ortOverride) return ortOverride;
  if (typeof globalThis.ort !== "undefined") return globalThis.ort;
  const mod = await import("onnxruntime-web");
  return mod.default ?? mod;
}

/** Shared ONNX session wrapper with latency EMA. */
class OnnxModel {
  constructor(modelPath, options = {}) {
    this.modelPath = modelPath;
    this.executionProviders = options.executionProviders ?? ["wasm"];
    this.ort = options.ort ?? null;
    this.session = null;
    this.emaDuration = 0;
    this.emaWeight = options.emaWeight ?? 0.1;
  }

  async load() {
    this.ort = await resolveOrt(this.ort);
    this.session = await this.ort.InferenceSession.create(this.modelPath, {
      executionProviders: this.executionProviders,
    });
    return this;
  }

  async run(feeds) {
    if (!this.session) await this.load();
    const start = performance.now();
    const results = await this.session.run(feeds);
    const elapsed = performance.now() - start;
    this.emaDuration =
      this.emaDuration === 0
        ? elapsed
        : this.emaWeight * elapsed + (1 - this.emaWeight) * this.emaDuration;
    return results;
  }

  tensor(data, dims) {
    return new this.ort.Tensor("float32", data, dims);
  }
}

/**
 * Mel spectrogram: Float32Array audio (fixed length, default 17280 = 1.08 s)
 * -> Float32Array frames*32 (log scaling already applied by the graph).
 */
class MelSpectrogram extends OnnxModel {
  constructor(modelPath, options = {}) {
    super(modelPath, options);
    this.numSamples = options.numSamples ?? 17280;
    this.melBins = 32;
  }

  async execute(audio) {
    if (audio.length !== this.numSamples) {
      const fixed = new Float32Array(this.numSamples);
      // Over-length windows keep the NEWEST samples (a larger batchSeconds
      // otherwise scored ~1 s stale audio); short ones left-pad with silence.
      if (audio.length > this.numSamples) {
        fixed.set(audio.subarray(audio.length - this.numSamples));
      } else {
        fixed.set(audio, this.numSamples - audio.length);
      }
      audio = fixed;
    }
    // The exported graph expects int16-range values.
    const scaled = new Float32Array(audio.length);
    for (let i = 0; i < audio.length; i++) scaled[i] = audio[i] * 32767.0;
    const out = await this.run({ input: this.tensor(scaled, [1, this.numSamples]) });
    const tensor = out.output;
    return { data: tensor.data, frames: tensor.dims[1], melBins: tensor.dims[2] };
  }
}

/**
 * Speech embedding: windows of 76 spectrogram frames (stride 8) -> 96-dim
 * embeddings, one batched session run per spectrogram.
 */
class SpeechEmbedding extends OnnxModel {
  constructor(modelPath, options = {}) {
    super(modelPath, options);
    this.windowSize = options.windowSize ?? 76;
    this.windowStride = options.windowStride ?? 8;
    this.embeddingDim = options.embeddingDim ?? 96;
    this.melBins = options.melBins ?? 32;
  }

  /** spectrogram: {data, frames, melBins} -> Array of Float32Array(96). */
  async execute(spectrogram) {
    const { data, frames, melBins } = spectrogram;
    const n = Math.floor((frames - this.windowSize) / this.windowStride) + 1;
    if (n <= 0) return [];
    const windowElems = this.windowSize * melBins;
    const batch = new Float32Array(n * windowElems);
    for (let w = 0; w < n; w++) {
      const startFrame = w * this.windowStride;
      batch.set(
        data.subarray(startFrame * melBins, (startFrame + this.windowSize) * melBins),
        w * windowElems,
      );
    }
    const out = await this.run({
      input: this.tensor(batch, [n, this.windowSize, melBins]),
    });
    const flat = out.output.data;
    const embeddings = [];
    for (let w = 0; w < n; w++) {
      embeddings.push(flat.slice(w * this.embeddingDim, (w + 1) * this.embeddingDim));
    }
    return embeddings;
  }
}

/**
 * Adaptive-energy VAD with hysteresis (JS mirror of
 * heybuddy_tpu.models.vad.EnergyVAD + the reference runtime's
 * positive/negative thresholds and silent-frame counting).
 */
class EnergyVAD {
  constructor(options = {}) {
    this.floorDecay = options.floorDecay ?? 0.98;
    this.noiseFloor = 1e-4;
    this.positiveThreshold = options.positiveThreshold ?? 0.5;
    this.negativeThreshold = options.negativeThreshold ?? 0.25;
    this.silentFramesToStop = options.silentFramesToStop ?? 8;
    this.speaking = false;
    this.silentFrames = 0;
    this.onSpeechStart = null;
    this.onSpeechEnd = null;
  }

  probability(audio) {
    let sum = 0;
    for (let i = 0; i < audio.length; i++) sum += audio[i] * audio[i];
    const rms = Math.sqrt(sum / Math.max(audio.length, 1));
    this.noiseFloor = Math.min(
      this.floorDecay * this.noiseFloor + (1 - this.floorDecay) * rms,
      Math.max(rms, 1e-5),
    );
    const ratio = rms / (this.noiseFloor + 1e-6);
    return Math.min(Math.max((ratio - 1.5) / 6.5, 0), 1);
  }

  /** Update the speaking state from the newest frame; returns speaking. */
  update(audio) {
    const p = this.probability(audio);
    if (!this.speaking && p >= this.positiveThreshold) {
      this.speaking = true;
      this.silentFrames = 0;
      if (this.onSpeechStart) this.onSpeechStart();
    } else if (this.speaking) {
      if (p < this.negativeThreshold) {
        this.silentFrames += 1;
        if (this.silentFrames >= this.silentFramesToStop) {
          this.speaking = false;
          this.silentFrames = 0;
          if (this.onSpeechEnd) this.onSpeechEnd();
        }
      } else {
        this.silentFrames = 0;
      }
    }
    return this.speaking;
  }
}

/**
 * Silero VAD head (reference runtime models/vad.ts:77-141): stateful ONNX
 * session over 512-sample chunks with the reference's hysteresis — speech
 * starts at probability >= 0.65, ends after 8 consecutive frames < 0.4.
 * Accepts both published Silero layouts: v3/v4 (inputs input/sr/h/c) and
 * v5 (inputs input/state/sr). Use the original silero-vad.onnx directly.
 */
class SileroVAD extends OnnxModel {
  constructor(modelPath, options = {}) {
    super(modelPath, options);
    this.sampleRate = options.sampleRate ?? 16000;
    this.chunkSize = options.chunkSize ?? 512;
    this.positiveThreshold = options.positiveThreshold ?? 0.65;
    this.negativeThreshold = options.negativeThreshold ?? 0.4;
    this.silentFramesToStop = options.silentFramesToStop ?? 8;
    this.speaking = false;
    this.silentFrames = 0;
    this.lastProbability = 0;
    this.onSpeechStart = null;
    this.onSpeechEnd = null;
    this._v5 = null;
    this._state = null;
    this._pending = new Float32Array(0);
  }

  async load() {
    await super.load();
    const names = this.session.inputNames;
    this._v5 = names.includes("state");
    this.reset();
    return this;
  }

  reset() {
    const stateDim = this._v5 ? 128 : 64;
    const zeros = () => new Float32Array(2 * stateDim);
    this._state = this._v5 ? [zeros()] : [zeros(), zeros()];
    this.speaking = false;
    this.silentFrames = 0;
    this._pending = new Float32Array(0);
  }

  /** Raw speech probability for one audio chunk (>= chunkSize samples). */
  async probability(audio) {
    if (!this.session) await this.load();
    const chunk = new Float32Array(this.chunkSize);
    chunk.set(audio.subarray(Math.max(0, audio.length - this.chunkSize)));
    const stateDim = this._v5 ? 128 : 64;
    const sr = new this.ort.Tensor("int64", BigInt64Array.from([BigInt(this.sampleRate)]), []);
    const feeds = { input: this.tensor(chunk, [1, this.chunkSize]), sr };
    if (this._v5) {
      feeds.state = this.tensor(this._state[0], [2, 1, stateDim]);
    } else {
      feeds.h = this.tensor(this._state[0], [2, 1, stateDim]);
      feeds.c = this.tensor(this._state[1], [2, 1, stateDim]);
    }
    const out = await this.run(feeds);
    const names = this.session.outputNames;
    if (this._v5) {
      this._state = [out[names.find((n) => n.startsWith("state"))].data];
    } else {
      this._state = [out.hn.data, out.cn.data];
    }
    this.lastProbability = out[names[0]].data[0];
    return this.lastProbability;
  }

  /**
   * Update the speaking state from the newest interval audio (reference
   * hasSpeechAudio hysteresis, vad.ts:108-141); returns speaking.
   *
   * The stateful RNN expects CONTIGUOUS fixed-size chunks: the interval is
   * accumulated and consumed in whole 512-sample chunks (remainder carried
   * to the next call) — zero-padding each call's tail fed the state a
   * discontinuous 37 %-zeroed stream and kept probabilities erratically low.
   * One hysteresis step runs per interval on the max chunk probability.
   */
  async update(audio) {
    const merged = new Float32Array(this._pending.length + audio.length);
    merged.set(this._pending);
    merged.set(audio, this._pending.length);
    let offset = 0;
    let p = this.lastProbability;
    let maxP = -1;
    while (merged.length - offset >= this.chunkSize) {
      p = await this.probability(merged.subarray(offset, offset + this.chunkSize));
      maxP = Math.max(maxP, p);
      offset += this.chunkSize;
    }
    this._pending = merged.slice(offset);
    if (maxP >= 0) p = maxP;
    if (!this.speaking && p >= this.positiveThreshold) {
      this.speaking = true;
      this.silentFrames = 0;
      if (this.onSpeechStart) this.onSpeechStart();
    } else if (this.speaking) {
      if (p < this.negativeThreshold) {
        this.silentFrames += 1;
        if (this.silentFrames >= this.silentFramesToStop) {
          this.speaking = false;
          this.silentFrames = 0;
          if (this.onSpeechEnd) this.onSpeechEnd();
        }
      } else {
        this.silentFrames = 0;
      }
    }
    return this.speaking;
  }
}

/** Wake-word head: [1, 16, 96] embedding buffer -> probability. */
class WakeWord extends OnnxModel {
  constructor(modelPath, options = {}) {
    super(modelPath, options);
    this.name =
      options.name ??
      modelPath.split("/").pop().replace(/\.onnx$/, "");
    this.frames = options.frames ?? 16;
    this.embeddingDim = options.embeddingDim ?? 96;
    this.threshold = options.threshold ?? 0.5;
    this.lastProbability = 0;
  }

  /** embeddings: Array of Float32Array(96), newest last; uses the last 16. */
  async execute(embeddings) {
    const take = embeddings.slice(-this.frames);
    if (take.length < this.frames) return 0;
    const buffer = new Float32Array(this.frames * this.embeddingDim);
    take.forEach((embedding, i) => buffer.set(embedding, i * this.embeddingDim));
    const out = await this.run({
      input: this.tensor(buffer, [1, this.frames, this.embeddingDim]),
    });
    this.lastProbability = out.output.data[0];
    return this.lastProbability;
  }
}

  // ---- src/hey-buddy.js --------------------------------------------
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



class HeyBuddy {
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


  HeyBuddy.HeyBuddy = HeyBuddy;
  HeyBuddy.AudioBatcher = AudioBatcher;
  HeyBuddy.OnnxModel = OnnxModel;
  HeyBuddy.MelSpectrogram = MelSpectrogram;
  HeyBuddy.SpeechEmbedding = SpeechEmbedding;
  HeyBuddy.EnergyVAD = EnergyVAD;
  HeyBuddy.SileroVAD = SileroVAD;
  HeyBuddy.WakeWord = WakeWord;
  HeyBuddy.resolveOrt = resolveOrt;
  HeyBuddy.MutexLock = MutexLock;
  return HeyBuddy;
});
