/**
 * Standalone AudioWorklet processor for CSP-restricted deployments that
 * cannot load Blob-URL modules (same processor that src/audio.js inlines):
 *   await context.audioWorklet.addModule("worklet.js");
 *   new AudioWorkletNode(context, "heybuddy-capture");
 * Resamples the input to 16 kHz and posts 20 ms (320-sample) Float32Array
 * frames to the main thread.
 */
class HeyBuddyCaptureProcessor extends AudioWorkletProcessor {
  constructor() {
    super();
    this.targetRate = 16000;
    this.frameSamples = 320;
    this.pending = new Float32Array(0);
    this.readPos = 0.0;
  }

  process(inputs) {
    const channel = inputs[0] && inputs[0][0];
    if (!channel || channel.length === 0) return true;

    const merged = new Float32Array(this.pending.length + channel.length);
    merged.set(this.pending);
    merged.set(channel, this.pending.length);
    this.pending = merged;

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
