"""Fused STFT-magnitude + mel-filterbank Pallas kernel.

The BASELINE.json north star: "the audio front-end becomes a fused
STFT+mel-filterbank Pallas/XLA kernel". TPUs have no native FFT unit — the
MXU is a matmul engine — so the rFFT is expressed as two real DFT matmuls
(cos/sin bases), which fuse with the windowing, magnitude, 1/n_fft scaling,
mel projection, dB conversion, and range normalization into ONE kernel:

    frames (T, n_fft) --window--> @C, @S (n_fft, n_bins) --|.|-->
    @mel_basis^T (n_bins, n_mels) --clip/log10/normalize--> (T, n_mels)

Everything stays in VMEM between stages; HBM traffic is one read of the
frames and one write of the (T, n_mels) output. The DFT-as-matmul costs
~40x the FLOPs of an FFT but runs on the 200-TFLOP MXU instead of the VPU,
and for n_fft=800 the bases fit VMEM easily.

Numerics match ops.mel.mel_spectrogram_tts (same chain as the reference
audio/spectrograms.py:8-54).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import mel as mel_ops


def _dft_bases(n_fft):
    """Real-DFT cosine/sine bases, (n_fft, n_fft//2+1) float32."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


def _kernel(frames_ref, cos_ref, sin_ref, melT_ref, out_ref, *, n_fft, min_amp, dyn_range):
    frames = frames_ref[:]  # (TILE_T, n_fft), window already applied
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    amp = jnp.sqrt(re * re + im * im) * (1.0 / n_fft)
    m = jnp.dot(amp, melT_ref[:], preferred_element_type=jnp.float32)
    m = jnp.maximum(m, min_amp)
    db = 20.0 * (jnp.log(m) / math.log(10.0))
    out_ref[:] = (db + dyn_range) * (1.0 / dyn_range)


@partial(
    jax.jit,
    static_argnames=("cfg", "tile_t", "interpret"),
)
def fused_mel_spectrogram(x, cfg: mel_ops.MelConfig, tile_t=128, interpret=None):
    """x: 1-D audio -> (T, n_mels) normalized-dB mel, one Pallas kernel.

    Equivalent to ops.mel.mel_spectrogram_tts (real_amplitude + centered +
    normalize_range path). interpret=None auto-selects interpreter mode off
    TPU so tests run on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_fft, hop = cfg.filter_length, cfg.hop_length
    if cfg.pre_emphasis:
        x = mel_ops.preemphasis(x, cfg.pre_emph_coeff)
    if x.shape[0] < n_fft:
        x = jnp.pad(x, (0, n_fft - x.shape[0]))
    if cfg.centered:
        x = jnp.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    n = x.shape[0]
    if n % hop == 0:
        T = int(math.floor((n - n_fft) / hop))
    else:
        T = 1 + int(math.floor((n - n_fft) / hop))

    # host-side constants
    window = jnp.asarray(mel_ops.hann_symmetric(n_fft))
    cos_b, sin_b = _dft_bases(n_fft)
    basis = mel_ops.mel_filterbank(
        n_fft, cfg.sampling_rate, cfg.n_mel_channels, cfg.mel_fmin, cfg.mel_fmax,
        cfg.normalize_mel_bins,
    )
    min_amp = cfg.min_clipping / (n_fft if cfg.real_amplitude else 1)
    dyn_range = -20.0 * math.log10(min_amp)

    # frame + window on the XLA side (gather), kernel does the fused math
    T_pad = ((T + tile_t - 1) // tile_t) * tile_t
    idx = jnp.minimum(jnp.arange(T_pad), T - 1)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[idx] * window[None, :]

    out = pl.pallas_call(
        partial(_kernel, n_fft=n_fft, min_amp=min_amp, dyn_range=dyn_range),
        out_shape=jax.ShapeDtypeStruct((T_pad, cfg.n_mel_channels), jnp.float32),
        grid=(T_pad // tile_t,),
        in_specs=[
            pl.BlockSpec((tile_t, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, cos_b.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, sin_b.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((basis.shape[1], basis.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_t, cfg.n_mel_channels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(frames, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(basis.T), )
    return out[:T]
