"""Rotation-matrix helpers (rot6d orthogonalization, transposes).

Reference semantics: ZEGGS/anim/txform.py:4-34 and ZEGGS/anim/xform.py.
Pure jnp, shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def transpose(xform):
    """Swap the last two axes (anim/txform.py:4-7)."""
    return jnp.swapaxes(xform, -1, -2)


def orthogonalize_from_xy(xy, eps=1e-10):
    """Build a full rotation matrix from the 2-axis ("rot6d") representation.

    ``xy`` has shape (..., 2, 3): rows are the (unnormalized) images of the
    x and y basis vectors. Returns (..., 3, 3) with *columns* x̂, ŷ, ẑ —
    matching anim/txform.py:23-34 (rows stacked then transposed).
    """
    xaxis = xy[..., 0:1, :]
    zaxis = jnp.cross(xaxis, xy[..., 1:2, :])
    yaxis = jnp.cross(zaxis, xaxis)
    rows = jnp.concatenate(
        [
            xaxis / (jnp.linalg.norm(xaxis, axis=-1)[..., None] + eps),
            yaxis / (jnp.linalg.norm(yaxis, axis=-1)[..., None] + eps),
            zaxis / (jnp.linalg.norm(zaxis, axis=-1)[..., None] + eps),
        ],
        axis=-2,
    )
    return transpose(rows)
