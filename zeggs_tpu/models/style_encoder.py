"""Style encoders: example motion clip -> style embedding (optionally VAE).

Reference architecture (modules.py:278-420):
  StyleEncoder wraps a body (GRU or attention) and, with use_vae, splits the
  body output into (mu, logvar) and reparameterizes with
  std = exp(0.5*logvar)/temperature.

  StyleEncoderAttn (default): 2x[ConvNorm1D(k=3)+ReLU+LayerNorm+Dropout(.2)]
  -> +sinusoidal positional encoding -> 1x FFT block (4-head MHA + conv FF)
  -> masked mean-pool over time.

  StyleEncoderGRU: 2x[ConvNorm1D(k=3)+ReLU] -> bi-GRU -> last-step projection.

TPU-first deviation: the reference mutates the example window length between
batches (train.py:227-229), which would trigger one XLA recompile per length.
Here examples are padded to a static maximum and a boolean mask carries the
true length; activations are re-zeroed at padding after every conv/LN so the
result is bit-equivalent to running the unpadded sequence (convs zero-pad at
the true boundary exactly as they would at a physical sequence end).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def sinusoidal_pos_enc(max_len, embed_dim, timestep=10000.0):
    """Sinusoidal table (modules.py:445-459), built vectorized."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, embed_dim, 2, dtype=np.float32) * (-math.log(timestep) / embed_dim))
    pe = np.zeros((max_len, embed_dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


def _mha_init(key, dim):
    """torch.nn.MultiheadAttention parameter layout: packed in-proj."""
    k1, k2 = jax.random.split(key)
    # torch initializes in_proj_weight with xavier_uniform over the packed
    # (3E, E) matrix and zeros both biases.
    a = math.sqrt(6.0 / (3 * dim + dim))
    return {
        "in_proj_w": L.uniform(k1, (dim, 3 * dim), a),  # stored (E, 3E)
        "in_proj_b": jnp.zeros((3 * dim,), jnp.float32),
        "out_proj": {
            "w": L.uniform(k2, (dim, dim), 1.0 / math.sqrt(dim)),
            "b": jnp.zeros((dim,), jnp.float32),
        },
    }


def init_attn(key, input_size, hidden_size, output_size, max_len=20000):
    ks = jax.random.split(key, 8)
    return {
        "conv0": L.conv1d_init(ks[0], input_size, hidden_size, 3, xavier_gain="relu"),
        "ln0": L.layer_norm_init(hidden_size),
        "conv1": L.conv1d_init(ks[1], hidden_size, output_size, 3, xavier_gain="relu"),
        "ln1": L.layer_norm_init(output_size),
        "mha": _mha_init(ks[2], output_size),
        "mha_ln": L.layer_norm_init(output_size),
        "ff_conv0": L.conv1d_init(ks[3], output_size, output_size, 3, xavier_gain="relu"),
        "ff_conv1": L.conv1d_init(ks[4], output_size, output_size, 3, xavier_gain="linear"),
        "ff_ln": L.layer_norm_init(output_size),
    }


def init_gru(key, input_size, hidden_size, output_size):
    ks = jax.random.split(key, 5)
    return {
        "conv0": L.conv1d_init(ks[0], input_size, hidden_size, 3, xavier_gain="relu"),
        "conv1": L.conv1d_init(ks[1], hidden_size, hidden_size, 3, xavier_gain="relu"),
        "gru_fwd": L.gru_layer_init(ks[2], hidden_size, hidden_size),
        "gru_bwd": L.gru_layer_init(ks[3], hidden_size, hidden_size),
        "proj": L.linear_xavier_init(ks[4], 2 * hidden_size, output_size, gain="linear"),
    }


def init(key, input_size, hidden_size, style_embedding_size, encoder_type="attn", use_vae=True):
    output_size = 2 * style_embedding_size if use_vae else style_embedding_size
    body = (
        init_attn(key, input_size, hidden_size, output_size)
        if encoder_type == "attn"
        else init_gru(key, input_size, hidden_size, output_size)
    )
    return {"body": body}


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _mask2d(x, mask):
    return x if mask is None else x * mask[..., None]


def apply_attn(params, x, lengths=None, *, train=False, rng=None):
    """x: (B, T, input_size) normalized example features (padded);
    lengths: (B,) int true lengths (None = full). Returns (B, output_size)."""
    B, T, _ = x.shape
    if lengths is None:
        mask = None
        lengths_f = jnp.full((B,), float(T))
    else:
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        lengths_f = lengths.astype(jnp.float32)

    rngs = list(jax.random.split(rng, 6)) if (train and rng is not None) else [None] * 6

    x = _mask2d(x, mask)
    h = jax.nn.relu(L.conv1d(params["conv0"], x))
    h = L.layer_norm(params["ln0"], h)
    h = L.dropout(h, 0.2, rngs[0], train)
    h = _mask2d(h, mask)
    h = jax.nn.relu(L.conv1d(params["conv1"], h))
    h = L.layer_norm(params["ln1"], h)
    h = L.dropout(h, 0.2, rngs[1], train)
    h = _mask2d(h, mask)

    E = h.shape[-1]
    h = h + sinusoidal_pos_enc(T, E)
    h = _mask2d(h, mask)

    # --- FFT block (modules.py:484-513) ---
    # multi-head attention + dropout + residual + LN
    B_, T_, E_ = h.shape
    qkv = h @ params["mha"]["in_proj_w"] + params["mha"]["in_proj_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    n_heads, hd = 4, E_ // 4
    q = q.reshape(B_, T_, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B_, T_, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B_, T_, n_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, jnp.finfo(logits.dtype).min)
    attn = jax.nn.softmax(logits, axis=-1)
    attn = L.dropout(attn, 0.1, rngs[2], train)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B_, T_, E_)
    out = out @ params["mha"]["out_proj"]["w"] + params["mha"]["out_proj"]["b"]
    out = L.dropout(out, 0.1, rngs[3], train)
    h = L.layer_norm(params["mha_ln"], out + h)
    h = _mask2d(h, mask)

    # position-wise conv feed-forward + dropout + residual + LN
    f = jax.nn.relu(L.conv1d(params["ff_conv0"], h))
    f = _mask2d(f, mask)
    f = L.conv1d(params["ff_conv1"], f)
    f = L.dropout(f, 0.1, rngs[4], train)
    h = L.layer_norm(params["ff_ln"], f + h)
    h = _mask2d(h, mask)

    # masked mean pool over time (modules.py:416-418)
    return jnp.sum(h, axis=1) / lengths_f[:, None]


def apply_gru(params, x, lengths=None, *, train=False, rng=None):
    """GRU body (modules.py:307-343). Bi-GRU; projection of the outputs at
    the last valid frame ([h_fwd(T-1), h_bwd(T-1)])."""
    B, T, _ = x.shape
    mask = None if lengths is None else (jnp.arange(T)[None, :] < lengths[:, None])
    x = _mask2d(x, mask)
    h = jax.nn.relu(L.conv1d(params["conv0"], x))
    h = _mask2d(h, mask)
    h = jax.nn.relu(L.conv1d(params["conv1"], h))
    h = _mask2d(h, mask)

    H = params["gru_fwd"]["w_hh"].shape[0]
    h0 = jnp.zeros((B, H), h.dtype)
    _, h_fwd_last = L.gru_scan(params["gru_fwd"], h, h0, mask=mask)
    ys_bwd, _ = L.gru_scan(params["gru_bwd"], h, h0, mask=mask, reverse=True)
    if lengths is None:
        h_bwd_last = ys_bwd[:, -1]
    else:
        idx = jnp.clip(lengths - 1, 0, T - 1)
        h_bwd_last = ys_bwd[jnp.arange(B), idx]
    return L.linear(params["proj"], jnp.concatenate([h_fwd_last, h_bwd_last], axis=-1))


def apply(
    params,
    x,
    lengths=None,
    *,
    encoder_type="attn",
    use_vae=True,
    style_embedding_size=64,
    temperature=1.0,
    train=False,
    rng=None,
    sample_rng=None,
):
    """Full style encoder with VAE head (modules.py:278-304).

    Returns (style_embedding, mu, logvar); mu/logvar are None without VAE.
    ``sample_rng`` drives the reparameterization; pass None with
    temperature->inf semantics unavailable — for deterministic output use
    ``sample_rng=None`` which returns mu (equivalent to eps=0).
    """
    body = apply_attn if encoder_type == "attn" else apply_gru
    enc = body(params["body"], x, lengths, train=train, rng=rng)
    if not use_vae:
        return enc, None, None
    mu = enc[:, :style_embedding_size]
    logvar = enc[:, style_embedding_size:]
    std = jnp.exp(0.5 * logvar) / temperature
    if sample_rng is None:
        eps = jnp.zeros_like(std)
    else:
        eps = jax.random.normal(sample_rng, std.shape, std.dtype)
    return mu + eps * std, mu, logvar
