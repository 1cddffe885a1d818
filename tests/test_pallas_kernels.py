"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeggs_tpu.models import layers as L
from zeggs_tpu.ops import mel
from zeggs_tpu.ops.pallas import fused_gru_cell, fused_mel_spectrogram
from tests.synthetic import make_audio


def test_fused_mel_matches_reference_chain():
    cfg = mel.MelConfig(normalize_loudness=False)
    x = jnp.asarray(make_audio(1.5))
    ref = np.asarray(mel.mel_spectrogram_tts(x, cfg))
    ours = np.asarray(fused_mel_spectrogram(x, cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_fused_mel_short_input():
    cfg = mel.MelConfig(normalize_loudness=False)
    x = jnp.asarray(make_audio(0.03))  # shorter than n_fft
    ref = np.asarray(mel.mel_spectrogram_tts(x, cfg))
    ours = np.asarray(fused_mel_spectrogram(x, cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("B,in_dim,H", [(8, 384, 256), (16, 2304, 512)])
def test_fused_gru_cell_matches_xla(B, in_dim, H):
    key = jax.random.PRNGKey(0)
    params = L.gru_layer_init(key, in_dim, H)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, in_dim)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    ref = np.asarray(L.gru_cell(params, x, h))
    ours = np.asarray(fused_gru_cell(params, x, h, tile_h=128))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


# ---------------------------------------------------------------------------
# whole-rollout fused decoder kernel (ops/pallas/decoder_kernel.py)
# ---------------------------------------------------------------------------

def test_fused_decoder_rollout_matches_xla():
    """The fused B=1 rollout (manual weight streaming, in-kernel pose
    integration) matches decoder.rollout over a 24-frame autoregressive
    run with float32 weights."""
    import numpy as np

    from zeggs_tpu.models import decoder, pose as P
    from zeggs_tpu.ops.pallas import decoder_kernel as DK

    njoints = 8
    pose_in = 6 + njoints * 15 + 3   # 129
    pose_out = 6 + njoints * 15      # 126
    H, S, C, T = 128, 16, 8, 24
    key = jax.random.PRNGKey(3)
    params = decoder.init(key, pose_in, pose_out, S, C, H, 2, "normal")

    rng = np.random.default_rng(0)
    mean_in = jnp.asarray(rng.normal(size=pose_in).astype(np.float32) * 0.05)
    std_in = jnp.asarray(rng.uniform(0.5, 2.0, pose_in).astype(np.float32))
    mean_out = jnp.asarray(rng.normal(size=pose_out).astype(np.float32) * 0.05)
    std_out = jnp.asarray(rng.uniform(0.5, 2.0, pose_out).astype(np.float32))

    q = rng.normal(size=(1, 4)).astype(np.float32)
    q /= np.linalg.norm(q)
    state0 = (
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32)),
        jnp.asarray(q),
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, njoints, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, njoints, 2, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, njoints, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, njoints, 3)).astype(np.float32) * 0.1),
    )
    gaze = jnp.asarray(rng.normal(size=(1, T, 3)).astype(np.float32))
    speech = jnp.asarray(rng.normal(size=(1, T, S)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(1, T, C)).astype(np.float32))
    dt = 1.0 / 60.0

    ref = decoder.rollout(
        params, *state0, gaze, speech, style,
        mean_in, std_in, mean_out, std_out, dt,
    )

    assert decoder.fused_b1_supported(params)
    fn = decoder.make_fused_b1_fn(
        params, mean_in, std_in, mean_out, std_out, dt,
        weights_dtype=jnp.float32, interpret=jax.default_backend() != "tpu",
    )
    out = fn(state0, gaze, speech, style)

    names = ["root_pos", "root_rot", "root_vel", "root_vrt",
             "lpos", "ltxy", "lvel", "lvrt"]
    for name, a, b in zip(names, ref, out):
        assert a.shape == b.shape, name
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-4, rtol=1e-3, err_msg=name
        )


def test_fused_decoder_rollout_int8_quantized():
    """The int8-quantized fused rollout (per-column weight scales, dynamic
    per-step activation quant, int8 MXU dots) tracks the fp32 rollout
    within quantization noise over a 24-frame autoregressive run."""
    import numpy as np

    from zeggs_tpu.models import decoder

    njoints = 8
    pose_in = 6 + njoints * 15 + 3
    pose_out = 6 + njoints * 15
    H, S, C, T = 128, 16, 8, 24
    key = jax.random.PRNGKey(3)
    params = decoder.init(key, pose_in, pose_out, S, C, H, 2, "normal")

    rng = np.random.default_rng(0)
    mean_in = jnp.asarray(rng.normal(size=pose_in).astype(np.float32) * 0.05)
    std_in = jnp.asarray(rng.uniform(0.5, 2.0, pose_in).astype(np.float32))
    mean_out = jnp.asarray(rng.normal(size=pose_out).astype(np.float32) * 0.05)
    std_out = jnp.asarray(rng.uniform(0.5, 2.0, pose_out).astype(np.float32))

    q = rng.normal(size=(1, 4)).astype(np.float32)
    q /= np.linalg.norm(q)
    state0 = (
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32)),
        jnp.asarray(q),
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, njoints, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, njoints, 2, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, njoints, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(1, njoints, 3)).astype(np.float32) * 0.1),
    )
    gaze = jnp.asarray(rng.normal(size=(1, T, 3)).astype(np.float32))
    speech = jnp.asarray(rng.normal(size=(1, T, S)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(1, T, C)).astype(np.float32))
    dt = 1.0 / 60.0

    ref = decoder.rollout(
        params, *state0, gaze, speech, style,
        mean_in, std_in, mean_out, std_out, dt,
    )
    fn = decoder.make_fused_b1_fn(
        params, mean_in, std_in, mean_out, std_out, dt,
        weights_dtype=jnp.int8, interpret=jax.default_backend() != "tpu",
    )
    out = fn(state0, gaze, speech, style)

    names = ["root_pos", "root_rot", "root_vel", "root_vrt",
             "lpos", "ltxy", "lvel", "lvrt"]
    for name, a, b in zip(names, ref, out):
        assert a.shape == b.shape, name
        err = np.abs(np.asarray(b) - np.asarray(a))
        scale = max(1.0, float(np.abs(np.asarray(a)).max()))
        assert err.max() / scale < 3e-2, (name, err.max(), scale)
