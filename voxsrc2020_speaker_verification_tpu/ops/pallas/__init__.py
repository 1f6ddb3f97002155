"""Pallas TPU kernels for the hot DSP ops."""

from .fbank import fbank_fused, frames_from_wave2d  # noqa: F401
