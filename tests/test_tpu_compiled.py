"""Compiled-kernel parity on a REAL TPU chip (``@pytest.mark.tpu`` lane).

CI pins the CPU backend, so the Pallas megakernel / int8 paths normally run
in interpret mode; these tests execute the ACTUAL Mosaic-compiled kernels
on the chip and assert parity against the XLA scan — the production B=1
serving path can't silently break under a jax/mosaic upgrade.

Run: ``ZEGGS_TPU_TESTS=1 python -m pytest -m tpu -q``
(one TPU process at a time; first run compiles ~minutes per kernel, the
persistent cache at /tmp/zeggs_jax_cache makes repeats fast).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeggs_tpu.models import decoder
from zeggs_tpu.ops import mel

pytestmark = pytest.mark.tpu

NJOINTS = 75
POSE_IN = 6 + NJOINTS * 15 + 3
POSE_OUT = 6 + NJOINTS * 15
T = 240  # 4 s rollout


@pytest.fixture(scope="module")
def full_model():
    """Full v1-dimension decoder + inputs (H=1024, 75 joints)."""
    key = jax.random.PRNGKey(3)
    params = decoder.init(key, POSE_IN, POSE_OUT, 64, 64, 1024, 2, "normal")
    rng = np.random.default_rng(0)
    mean_in = jnp.asarray(rng.normal(size=POSE_IN).astype(np.float32) * 0.05)
    std_in = jnp.asarray(rng.uniform(0.5, 2.0, POSE_IN).astype(np.float32))
    mean_out = jnp.asarray(rng.normal(size=POSE_OUT).astype(np.float32) * 0.05)
    std_out = jnp.asarray(rng.uniform(0.5, 2.0, POSE_OUT).astype(np.float32))
    q = rng.normal(size=(1, 4)).astype(np.float32)
    q /= np.linalg.norm(q)
    state0 = (
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32)),
        jnp.asarray(q),
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, NJOINTS, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, NJOINTS, 2, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, NJOINTS, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, NJOINTS, 3)).astype(np.float32) * 0.1),
    )
    gaze = jnp.asarray(rng.normal(size=(1, T, 3)).astype(np.float32))
    speech = jnp.asarray(rng.normal(size=(1, T, 64)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(1, T, 64)).astype(np.float32))
    stats = (mean_in, std_in, mean_out, std_out)
    ref = decoder.rollout(params, *state0, gaze, speech, style, *stats, 1.0 / 60.0)
    ref = jax.device_get(ref)
    return params, stats, state0, (gaze, speech, style), ref


_NAMES = ["root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"]


def test_backend_is_tpu():
    assert jax.default_backend() == "tpu", "TPU lane requires the real chip"


def test_fused_b1_bf16_compiled_matches_scan(full_model):
    """The production B=1 path: Mosaic-compiled fused rollout, bf16
    streamed weights, vs the fp32 XLA scan (bf16 rounding tolerance)."""
    params, stats, state0, (gaze, speech, style), ref = full_model
    assert decoder.fused_b1_supported(params)
    fn = decoder.make_fused_b1_fn(params, *stats, 1.0 / 60.0,
                                  weights_dtype=jnp.bfloat16, interpret=False)
    out = jax.device_get(fn(state0, gaze, speech, style))
    for name, a, b in zip(_NAMES, ref, out):
        assert a.shape == b.shape, name
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(b - a).max()) / scale
        assert err < 3e-2, (name, err)
        assert np.isfinite(b).all(), name


def test_fused_b1_int8_compiled_matches_scan(full_model):
    """int8 fused rollout (per-column scales, int8 MXU dots) on the chip,
    within quantization noise of the fp32 scan — the pose MAE budget from
    PARITY.md (3-5e-4 measured, 1e-3 target) on positions."""
    params, stats, state0, (gaze, speech, style), ref = full_model
    fn = decoder.make_fused_b1_fn(params, *stats, 1.0 / 60.0,
                                  weights_dtype=jnp.int8, interpret=False)
    out = jax.device_get(fn(state0, gaze, speech, style))
    for name, a, b in zip(_NAMES, ref, out):
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(b - a).max()) / scale
        assert err < 5e-2, (name, err)
        assert np.isfinite(b).all(), name


def test_batched_int8_scan_matches_fp32(full_model):
    """The batched int8 XLA-scan serving path vs fp32 at B=8."""
    params, stats, _, _, _ = full_model
    rng = np.random.default_rng(7)
    B = 8
    q = rng.normal(size=(B, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    state0 = (
        jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32)),
        jnp.asarray(q),
        jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(B, NJOINTS, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, NJOINTS, 2, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, NJOINTS, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(B, NJOINTS, 3)).astype(np.float32) * 0.1),
    )
    gaze = jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32))
    speech = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
    ref = jax.device_get(decoder.rollout(
        params, *state0, gaze, speech, style, *stats, 1.0 / 60.0
    ))
    out = jax.device_get(decoder.rollout(
        params, *state0, gaze, speech, style, *stats, 1.0 / 60.0,
        quantize_int8=True,
    ))
    for name, a, b in zip(_NAMES, ref, out):
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(b - a).max()) / scale < 5e-2, name


def test_mel_kernel_compiled_matches_reference():
    """The fused Pallas mel kernel compiled on-chip vs ops.mel numerics.

    Tolerance: TPU dots default to bf16 operand precision, so the compiled
    kernel's DFT/mel matmuls and the XLA reference chain each carry ~1e-3
    noise on the [0, 1]-normalized dB scale (measured max 1.7e-3). The
    kernel is flag-gated, not the production mel path (docs/DESIGN.md §6).
    """
    from tests.synthetic import make_audio
    from zeggs_tpu.ops.pallas import fused_mel_spectrogram

    cfg = mel.MelConfig(normalize_loudness=False)
    x = jnp.asarray(make_audio(1.5))
    ref = np.asarray(mel.mel_spectrogram_tts(x, cfg))
    ours = np.asarray(fused_mel_spectrogram(x, cfg, interpret=False))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    assert float(np.abs(ours - ref).mean()) < 5e-4
