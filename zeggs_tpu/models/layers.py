"""Parameter initializers and primitive layers (plain pytrees + pure fns).

Initialization matches PyTorch defaults so that from-scratch training has the
same statistical starting point as the reference, and torch checkpoints map
1:1 onto these pytrees (weights here are stored transposed, (in, out), so the
forward pass is a plain ``x @ w + b`` feeding the MXU).

PyTorch defaults reproduced:
  nn.Linear / nn.Conv1d: U(-k, k) with k = 1/sqrt(fan_in)   (weight and bias)
  nn.GRU: U(-k, k) with k = 1/sqrt(hidden_size)
  LinearNorm / ConvNorm1D (reference modules.py:426-442,615-651):
      xavier_uniform with gain = calculate_gain(w_init_gain)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_GAIN = {"linear": 1.0, "relu": math.sqrt(2.0), "tanh": 5.0 / 3.0}


def uniform(key, shape, k):
    return jax.random.uniform(key, shape, jnp.float32, -k, k)


def linear_init(key, in_dim, out_dim):
    """nn.Linear default init; weight stored (in, out)."""
    kw, kb = jax.random.split(key)
    k = 1.0 / math.sqrt(in_dim)
    return {"w": uniform(kw, (in_dim, out_dim), k), "b": uniform(kb, (out_dim,), k)}


def linear_xavier_init(key, in_dim, out_dim, gain="linear", bias=True):
    """LinearNorm: xavier_uniform weight, default-init bias
    (modules.py:426-434)."""
    kw, kb = jax.random.split(key)
    a = _GAIN[gain] * math.sqrt(6.0 / (in_dim + out_dim))
    p = {"w": uniform(kw, (in_dim, out_dim), a)}
    if bias:
        # torch keeps the nn.Linear default bias init after re-initing weight
        p["b"] = uniform(kb, (out_dim,), 1.0 / math.sqrt(in_dim))
    return p


def linear(params, x):
    return x @ params["w"] + params["b"]


def conv1d_init(key, in_ch, out_ch, kernel_size, xavier_gain=None):
    """Conv1d weights stored (K, in, out) for NWC/WIO conv dims."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel_size
    if xavier_gain is None:
        k = 1.0 / math.sqrt(fan_in)
        w = uniform(kw, (kernel_size, in_ch, out_ch), k)
    else:
        # xavier on torch's (out, in, K) layout: fan_in = in*K, fan_out = out*K
        a = _GAIN[xavier_gain] * math.sqrt(6.0 / (in_ch * kernel_size + out_ch * kernel_size))
        w = uniform(kw, (kernel_size, in_ch, out_ch), a)
    b = uniform(kb, (out_ch,), 1.0 / math.sqrt(fan_in))
    return {"w": w, "b": b}


def conv1d(params, x, padding="zero"):
    """1-D convolution over (B, T, C) with 'same' length.

    padding: 'zero' (torch default) or 'replicate' (SpeechEncoder,
    modules.py:253-260).
    """
    k = params["w"].shape[0]
    pad_l, pad_r = (k - 1) // 2, k // 2
    if padding == "replicate":
        x = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)), mode="edge")
    else:
        x = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + params["b"]


def layer_norm_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def dropout(x, rate, rng, train):
    """Inverted dropout, torch semantics (scale at train time)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def elu(x):
    return jax.nn.elu(x)


# ---------------------------------------------------------------------------
# GRU (PyTorch gate semantics: r, z, n)
# ---------------------------------------------------------------------------

def gru_layer_init(key, input_size, hidden_size):
    """One GRU layer. Weights stored transposed: w_ih (in, 3H), w_hh (H, 3H);
    gate order along the 3H axis is (reset, update, new) as in torch."""
    k = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": uniform(k1, (input_size, 3 * hidden_size), k),
        "w_hh": uniform(k2, (hidden_size, 3 * hidden_size), k),
        "b_ih": uniform(k3, (3 * hidden_size,), k),
        "b_hh": uniform(k4, (3 * hidden_size,), k),
    }


def gru_cell(params, x, h):
    """Single GRU step; x (B, in), h (B, H) -> new h (B, H).

    r = s(W_ir x + b_ir + W_hr h + b_hr); z = s(...); n = tanh(i_n + r*h_n);
    h' = (1 - z) * n + z * h   — torch.nn.GRU equations.
    """
    gi = x @ params["w_ih"] + params["b_ih"]
    gh = h @ params["w_hh"] + params["b_hh"]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H : 2 * H], gi[..., 2 * H :]
    h_r, h_z, h_n = gh[..., :H], gh[..., H : 2 * H], gh[..., 2 * H :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_scan(params, xs, h0, mask=None, reverse=False):
    """Run a GRU layer over time. xs (B, T, in), h0 (B, H) -> (B, T, H).

    With ``mask`` (B, T) the hidden state is held (not updated) at padding
    steps, so the final carry equals the hidden at each row's last valid
    frame — the TPU-native replacement for variable-length batches.
    """

    def step(h, inp):
        if mask is None:
            x = inp
            h_new = gru_cell(params, x, h)
        else:
            x, m = inp
            h_new = gru_cell(params, x, h)
            h_new = jnp.where(m[:, None], h_new, h)
        return h_new, h_new

    xs_t = jnp.swapaxes(xs, 0, 1)  # (T, B, in)
    inputs = xs_t if mask is None else (xs_t, jnp.swapaxes(mask, 0, 1))
    h_last, ys = jax.lax.scan(step, h0, inputs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), h_last
