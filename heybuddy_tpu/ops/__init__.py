from heybuddy_tpu.ops.melspec import mel_spectrogram, mel_filterbank, dft_basis, frame_audio, num_frames
from heybuddy_tpu.ops.windows import embedding_window_starts, extract_windows, num_embedding_windows

__all__ = [
    "mel_spectrogram",
    "mel_filterbank",
    "dft_basis",
    "frame_audio",
    "num_frames",
    "embedding_window_starts",
    "extract_windows",
    "num_embedding_windows",
]
