"""Fused GRU cell as a Pallas kernel.

One kernel per step: both input/hidden projections run on the MXU and the
gate nonlinearities + blend run on the VPU with everything resident in
VMEM — no HBM round-trips between the matmuls and the gates (the
north-star "fused Pallas GRU cells" for the decoder scan,
BASELINE.json).

Grid: tiles of the hidden dimension. Program j computes output columns
[j*TILE_H, (j+1)*TILE_H) by loading the three matching column stripes of
W_ih / W_hh (gate order r, z, n along the packed 3H axis, torch layout).

Standalone-validated building block (tests/test_pallas_kernels.py); the
production rollout uses the XLA GRU, which fuses the adjacent elementwise
ops already — see docs/DESIGN.md for the measured comparison. Training
keeps the XLA GRU (autodiff'd).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, h_ref, h_cols_ref, wi_r_ref, wi_z_ref, wi_n_ref, wh_r_ref, wh_z_ref,
            wh_n_ref, b_r_ref, b_z_ref, b_n_ref, out_ref):
    x = x_ref[:]
    h = h_ref[:]
    i_r = jnp.dot(x, wi_r_ref[:], preferred_element_type=jnp.float32)
    i_z = jnp.dot(x, wi_z_ref[:], preferred_element_type=jnp.float32)
    i_n = jnp.dot(x, wi_n_ref[:], preferred_element_type=jnp.float32)
    h_r = jnp.dot(h, wh_r_ref[:], preferred_element_type=jnp.float32)
    h_z = jnp.dot(h, wh_z_ref[:], preferred_element_type=jnp.float32)
    h_n = jnp.dot(h, wh_n_ref[:], preferred_element_type=jnp.float32)
    r = jax.nn.sigmoid(i_r + h_r + b_r_ref[:])
    z = jax.nn.sigmoid(i_z + h_z + b_z_ref[:])
    n = jnp.tanh(i_n + b_n_ref[0:1, :] + r * (h_n + b_n_ref[1:2, :]))
    out_ref[:] = (1.0 - z) * n + z * h_cols_ref[:].astype(jnp.float32)


@partial(jax.jit, static_argnames=("tile_h", "interpret"))
def fused_gru_cell(params, x, h, tile_h=128, interpret=None):
    """PyTorch-semantics GRU step as a fused Pallas kernel.

    params: {w_ih (in, 3H), w_hh (H, 3H), b_ih (3H,), b_hh (3H,)}.
    x (B, in), h (B, H) -> (B, H). Matches models.layers.gru_cell:
      r = s(i_r + h_r); z = s(i_z + h_z); n = tanh(i_n + b_in + r*(h_n + b_hn))
      h' = (1-z) n + z h.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H = h.shape[-1]
    assert H % tile_h == 0 or tile_h >= H, (H, tile_h)
    tile_h = min(tile_h, H)
    w_ih, w_hh = params["w_ih"], params["w_hh"]
    b_ih, b_hh = params["b_ih"], params["b_hh"]
    in_dim = w_ih.shape[0]

    wi_r, wi_z, wi_n = w_ih[:, :H], w_ih[:, H : 2 * H], w_ih[:, 2 * H :]
    wh_r, wh_z, wh_n = w_hh[:, :H], w_hh[:, H : 2 * H], w_hh[:, 2 * H :]
    # combined biases where they simply add; b_in/b_hn kept separate
    b_r = (b_ih[:H] + b_hh[:H])[None, :]
    b_z = (b_ih[H : 2 * H] + b_hh[H : 2 * H])[None, :]
    b_n = jnp.stack([b_ih[2 * H :], b_hh[2 * H :]])  # (2, H)

    B = x.shape[0]
    grid = (H // tile_h,)
    col = lambda i: (0, i)

    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, in_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_h), col, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_h), col, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, h, h, wi_r, wi_z, wi_n, wh_r, wh_z, wh_n, b_r, b_z, b_n)
