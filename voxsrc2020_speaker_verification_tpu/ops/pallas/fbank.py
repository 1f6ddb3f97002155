"""Fused FBANK Pallas kernel: waveform -> log-mel in one VMEM-resident pass.

The XLA path (ops/fbank.py) materializes the framed signal (B, T, 400) in
HBM between the gather and the analysis matmuls -- 2.5x the waveform bytes
written + read back.  This kernel keeps each frame tile in VMEM through
framing -> windowed rDFT (two matmuls) -> power -> mel matmul -> log, so HBM
traffic is essentially waveform in + (B, T, F) features out.

Framing trick (no gather): with Kaldi's frame_shift=160 and
frame_length=400, sample s of frame t is wave[160*t + s]; writing
s = 160*q + r (q in {0,1,2}, r < 160) gives

    frames[t, 160*q + r] = wave2d[t + q, r],   wave2d = wave.reshape(-1, 160)

i.e. a frame tile is three *static* shifted row-slices of the reshaped
waveform, concatenated and cropped to 400 -- pure VMEM moves feeding the
MXU.  Holds for any config with frame_length <= 3 * frame_shift (Kaldi
defaults: 25 ms / 10 ms @ 16 kHz).  Tiles carry their q = ceil(400/160)
overlap rows duplicated (~1% extra input bytes) so BlockSpecs stay
non-overlapping.

Numerics match ops/fbank.py (same fp32 analysis matrices; parity asserted in
tests/test_pallas.py).  Dither is not supported here -- offline feature prep
uses the XLA path when dithering.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fbank import FLT_EPSILON, FbankConfig, analysis_matrices, num_frames

T_TILE = 256  # frames per grid step: (256, 400) @ (400, 256) tiles the MXU


def frames_from_wave2d(wave2d: jax.Array, t: int, frame_shift: int,
                       frame_length: int) -> jax.Array:
    """(rows, shift) reshaped waveform -> (t, frame_length) frames via the
    shifted-row-slices identity (requires frame_length <= 3 * shift and
    rows >= t + ceil(frame_length/shift) - 1)."""
    q = -(-frame_length // frame_shift)
    parts = [wave2d[i: i + t] for i in range(q)]
    return jnp.concatenate(parts, axis=1)[:, :frame_length]


def _fbank_kernel(wave_ref, a_ref, b_ref, m_ref, out_ref, *,
                  frame_shift, frame_length, use_power, use_log, eps):
    # frames @ A decomposed into q shifted partial matmuls: lane-aligned for
    # Mosaic (a concat of 160-wide slices into 480 lanes is not), and each
    # (T_TILE, shift) @ (shift, bins) block tiles the MXU directly.
    w = wave_ref[0, 0]
    q = -(-frame_length // frame_shift)
    re = jnp.zeros((T_TILE, a_ref.shape[1]), jnp.float32)
    im = jnp.zeros((T_TILE, a_ref.shape[1]), jnp.float32)
    for i in range(q):
        rows = min(frame_length - i * frame_shift, frame_shift)
        wi = w[i: i + T_TILE, :rows]
        # HIGHEST: true fp32 MXU passes -- default precision drops to bf16
        # on TPU and the re^2+im^2 cancellation amplifies it into the log
        re += jnp.dot(wi, a_ref[i * frame_shift: i * frame_shift + rows],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        im += jnp.dot(wi, b_ref[i * frame_shift: i * frame_shift + rows],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im
    if not use_power:
        power = jnp.sqrt(power)
    mel = jnp.dot(power, m_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if use_log:
        mel = jnp.log(jnp.maximum(mel, eps))
    out_ref[0] = mel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fbank_fused(
    waves: jax.Array,
    cfg: FbankConfig = FbankConfig(),
    *,
    interpret: bool = False,
) -> jax.Array:
    """Batched fused log-mel FBANK: (B, S) int16-scale float32 -> (B, T, F).

    Same contract as ops.fbank.fbank (T = num_frames(S); frames past an
    utterance's true length are garbage to be masked downstream), minus
    dither.  Requires frame_length <= 3 * frame_shift.
    """
    if waves.ndim == 1:
        return fbank_fused(waves[None], cfg, interpret=interpret)[0]
    assert waves.ndim == 2
    b, s = waves.shape
    shift, length = cfg.frame_shift, cfg.frame_length
    q = -(-length // shift)
    assert length <= 3 * shift, (length, shift)
    t = num_frames(s, cfg)
    assert t >= 1, "waveform shorter than one frame"

    a, bb, m = analysis_matrices(cfg)
    f = m.shape[1]

    # rows of `shift` samples; tile j covers frames [j*T_TILE, (j+1)*T_TILE)
    # and needs rows [j*T_TILE, j*T_TILE + T_TILE + q - 1) -- carried with
    # the q-1 (+1 spare) overlap rows duplicated per tile.
    num_tiles = -(-t // T_TILE)
    tile_rows = T_TILE + q
    rows_needed = (num_tiles - 1) * T_TILE + tile_rows
    wave2d = jnp.pad(
        waves.astype(jnp.float32),
        ((0, 0), (0, rows_needed * shift - s)),
    ).reshape(b, rows_needed, shift)
    wave_tiles = jnp.stack(
        [wave2d[:, j * T_TILE: j * T_TILE + tile_rows] for j in range(num_tiles)],
        axis=1,
    )  # (B, num_tiles, tile_rows, shift)

    out = pl.pallas_call(
        functools.partial(
            _fbank_kernel, frame_shift=shift, frame_length=length,
            use_power=cfg.use_power, use_log=cfg.use_log_fbank,
            eps=FLT_EPSILON,
        ),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tile_rows, shift),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((length, a.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((length, a.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a.shape[1], f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_TILE, f), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_tiles * T_TILE, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_tiles * T_TILE * length * a.shape[1] * 2
            + 2 * b * num_tiles * T_TILE * a.shape[1] * f,
            bytes_accessed=waves.size * 4 + b * t * f * 4,
            transcendentals=b * num_tiles * T_TILE * f,
        ),
        interpret=interpret,
    )(wave_tiles, jnp.asarray(a), jnp.asarray(bb), jnp.asarray(m))
    return out[:, :t]
