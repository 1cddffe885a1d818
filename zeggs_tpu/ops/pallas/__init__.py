"""Pallas TPU kernels for the hot ops (with interpret-mode CPU fallback)."""

from .mel_kernel import fused_mel_spectrogram  # noqa: F401
from .gru_kernel import fused_gru_cell  # noqa: F401
