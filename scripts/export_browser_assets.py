#!/usr/bin/env python
"""Export the shared browser-runtime ONNX assets (mel spectrogram + embedding)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Weight extraction needs no accelerator; avoid remote-device init/compiles.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from heybuddy_tpu.export.onnx_export import export_embedding_net, export_mel_spectrogram


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "browser/models"
    os.makedirs(out_dir, exist_ok=True)
    mel_path = os.path.join(out_dir, "mel-spectrogram.onnx")
    emb_path = os.path.join(out_dir, "speech-embedding.onnx")
    export_mel_spectrogram(mel_path)
    export_embedding_net(emb_path)
    print(f"Wrote {mel_path}")
    print(f"Wrote {emb_path}")


if __name__ == "__main__":
    main()
