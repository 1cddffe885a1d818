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
