"""TPU compute ops: mel frontend, attention, quantization kernels."""

from ttasr.ops.mel import log_mel_spectrogram, mel_filter_bank, N_SAMPLES, N_FRAMES

__all__ = ["log_mel_spectrogram", "mel_filter_bank", "N_SAMPLES", "N_FRAMES"]
