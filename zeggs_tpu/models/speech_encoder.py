"""Speech encoder: per-frame audio features -> speech encoding.

Architecture (reference modules.py:249-272):
  Conv1d(k=1) -> ELU -> Dropout(0.2) -> Conv1d(k=31, replicate pad) -> ELU
  -> Dropout(0.2) -> Linear -> ELU

Both convs run as NWC convolutions XLA maps onto the MXU; the k=1 conv is
just a matmul.
"""

from __future__ import annotations

import jax

from . import layers as L


def init(key, input_size, hidden_size, output_size):
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "conv0": L.conv1d_init(k0, input_size, hidden_size, 1),
        "conv1": L.conv1d_init(k1, hidden_size, output_size, 31),
        "linear": L.linear_init(k2, output_size, output_size),
    }


def apply(params, x, *, train=False, rng=None):
    """x: (B, T, n_audio_features), already mean/std normalized."""
    r0 = r1 = None
    if train and rng is not None:
        r0, r1 = jax.random.split(rng)
    h = L.elu(L.conv1d(params["conv0"], x, padding="replicate"))
    h = L.dropout(h, 0.2, r0, train)
    h = L.elu(L.conv1d(params["conv1"], h, padding="replicate"))
    h = L.dropout(h, 0.2, r1, train)
    return L.elu(L.linear(params["linear"], h))
