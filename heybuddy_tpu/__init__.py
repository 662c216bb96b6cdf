"""
heybuddy-tpu: a TPU-native wake-word training and deployment framework.

JAX/XLA/Pallas re-design of the capabilities of hey-buddy
(https://github.com/therealadityashankar/hey-buddy): TTS sample synthesis,
on-device augmentation, fused featurization, three-stage classifier training
with dynamic false-positive control, and ONNX export for the browser runtime.
"""

__version__ = "0.1.0"
