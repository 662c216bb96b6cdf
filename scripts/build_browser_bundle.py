#!/usr/bin/env python
"""
Build the browser runtime's distribution artifacts (reference parity:
``src/ts/webpack.config.js`` UMD bundle + ``worklet.config.js`` worklet
bundle + npm packaging), without node/webpack — neither exists in this
image, and the runtime is dependency-free ES modules, so bundling is
deterministic source concatenation:

  browser/dist/hey-buddy.js      — readable UMD bundle (global `HeyBuddy`,
                                    named exports on `HeyBuddy.*`)
  browser/dist/hey-buddy.min.js  — comment/blank-stripped bundle
  browser/dist/worklet.min.js    — stripped standalone AudioWorklet
  browser/dist/hey-buddy.d.ts    — TypeScript declarations

The UMD wrapper follows the standard pattern: CommonJS -> module.exports,
AMD -> define, browser -> window.HeyBuddy (callable constructor with the
named exports attached as properties).

Usage: python scripts/build_browser_bundle.py [--out browser/dist]
"""

from __future__ import annotations

import argparse
import os
import re

BROWSER_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "browser")

# Concatenation order respects the import graph: mutex/audio -> models -> hey-buddy.
MODULES = ["src/mutex.js", "src/audio.js", "src/models.js", "src/hey-buddy.js"]

UMD_HEADER = """\
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
"""

UMD_FOOTER = """\
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
"""

DTS = """\
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
"""

_IMPORT_RE = re.compile(r'^import\s+.*?from\s+["\'][^"\']+["\'];\s*$', re.MULTILINE)
_EXPORT_DEFAULT_RE = re.compile(r"^export\s+default\s+\w+;\s*$", re.MULTILINE)
_EXPORT_RE = re.compile(r"^export\s+(?=(?:async\s+)?(?:class|function|const|let|var)\b)", re.MULTILINE)


def strip_modules(source: str) -> str:
    """Remove ES module syntax so sources concatenate into one scope."""
    source = _IMPORT_RE.sub("", source)
    source = _EXPORT_DEFAULT_RE.sub("", source)
    source = _EXPORT_RE.sub("", source)
    return source


def strip_comments(source: str) -> str:
    """
    Conservative size reduction: drop full-line comments, block comments that
    start at a line head, and blank lines. String/regex literals are never
    touched because only whole-line matches are removed.
    """
    out = []
    in_block = False
    for line in source.splitlines():
        stripped = line.strip()
        if in_block:
            if "*/" in stripped:
                in_block = False
            continue
        if stripped.startswith("/*") or stripped.startswith("/**"):
            if "*/" not in stripped:
                in_block = True
            continue
        if stripped.startswith("//") or stripped.startswith("*"):
            continue
        if not stripped:
            continue
        out.append(line.rstrip())
    return "\n".join(out) + "\n"


def build(out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    bodies = []
    for rel in MODULES:
        with open(os.path.join(BROWSER_DIR, rel)) as f:
            bodies.append(f"  // ---- {rel} " + "-" * max(0, 60 - len(rel)) + "\n" + strip_modules(f.read()))
    bundle = UMD_HEADER + "\n".join(bodies) + "\n" + UMD_FOOTER

    with open(os.path.join(BROWSER_DIR, "worklet.js")) as f:
        worklet = f.read()

    artifacts = {
        "hey-buddy.js": bundle,
        "hey-buddy.min.js": strip_comments(bundle),
        "worklet.min.js": strip_comments(worklet),
        "hey-buddy.d.ts": DTS,
    }
    for name, content in artifacts.items():
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(content)
    return artifacts


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=os.path.join(BROWSER_DIR, "dist"))
    args = parser.parse_args()
    artifacts = build(args.out)
    for name, content in artifacts.items():
        print(f"{name}: {len(content):,} bytes -> {args.out}")


if __name__ == "__main__":
    main()
