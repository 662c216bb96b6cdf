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

export class AudioBatcher {
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
