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
export async function resolveOrt(ortOverride = null) {
  if (ortOverride) return ortOverride;
  if (typeof globalThis.ort !== "undefined") return globalThis.ort;
  const mod = await import("onnxruntime-web");
  return mod.default ?? mod;
}

/** Shared ONNX session wrapper with latency EMA. */
export class OnnxModel {
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
export class MelSpectrogram extends OnnxModel {
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
export class SpeechEmbedding extends OnnxModel {
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
export class EnergyVAD {
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
export class SileroVAD extends OnnxModel {
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
export class WakeWord extends OnnxModel {
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
