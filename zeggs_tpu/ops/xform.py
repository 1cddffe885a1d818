"""Rotation-matrix / homogeneous-transform helpers.

Reference semantics: ZEGGS/anim/txform.py:4-34, ZEGGS/anim/xform.py:6-153
and ZEGGS/anim/mat.py:3-19. Pure jnp, shape-polymorphic over leading batch
dims (the reference's ``psolve`` is single-matrix numpy with a TODO to
batch it — here every function batches; its svd ``orthogonalize`` calls a
``mat.svd`` that does not exist upstream — here it works).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU matmul defaults to bf16 passes (~3e-3 rel err even for 3x3); the
# fixed-point iteration in orthogonalize_iterative amplifies that noise and
# psolve's eps**2=1e-10 regularizer is swamped by it. Every matmul in this
# module therefore pins full fp32 accumulation.
_F32 = jax.lax.Precision.HIGHEST


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


# ---------------------------------------------------------------------------
# dense matrix helpers (anim/mat.py:3-19)
# ---------------------------------------------------------------------------

def mul(x, y):
    """Matrix product over the trailing two axes (anim/mat.py:3-4)."""
    return jnp.matmul(x, y)


def mul_vec(x, y):
    """Apply (..., m, n) matrices to (..., n) vectors (anim/mat.py:6-7)."""
    return jnp.matmul(x, y[..., None])[..., 0]


def psolve(x, y, eps=1e-5):
    """Regularized pseudo-solve ``pinv(x) @ y`` transposed, matching
    anim/mat.py:13-19 — but batched over leading dims (the reference's
    version handles a single 2-D matrix and carries a TODO for batching).

    For (..., m, n) ``x``: under-determined (m < n) solves the Gram system
    on the n side, over-determined (m > n) on the m side, square adds
    eps**2 * I directly. Returns ``y``-shaped-transposed solutions exactly
    as the reference does.
    """
    m, n = x.shape[-2], x.shape[-1]
    xt = transpose(x)
    if m < n:
        a = jnp.matmul(xt, x, precision=_F32) + (eps * eps) * jnp.eye(n, dtype=x.dtype)
        return transpose(jnp.linalg.solve(a, jnp.matmul(xt, y, precision=_F32)))
    if m > n:
        a = jnp.matmul(x, xt, precision=_F32) + (eps * eps) * jnp.eye(m, dtype=x.dtype)
        return transpose(jnp.matmul(xt, jnp.linalg.solve(a, y), precision=_F32))
    a = x + (eps * eps) * jnp.eye(m, dtype=x.dtype)
    return transpose(jnp.linalg.solve(a, y))


# ---------------------------------------------------------------------------
# rotation matrices / homogeneous 4x4 transforms (anim/xform.py:6-153)
# ---------------------------------------------------------------------------

def to_translation(x):
    """Translation column of a homogeneous 4x4, w-normalized
    (anim/xform.py:6-7)."""
    return x[..., :3, 3] / x[..., 3, 3][..., None]


def to_rotation(x):
    """Upper-left 3x3 block (anim/xform.py:10-11)."""
    return x[..., :3, :3]


def to_rotation_translation(x):
    """(rotation, translation) pair (anim/xform.py:14-15)."""
    return to_rotation(x), to_translation(x)


def from_rotation_translation(rot, pos):
    """Pack (..., 3, 3) + (..., 3) into homogeneous (..., 4, 4)
    (anim/xform.py:40-43)."""
    top = jnp.concatenate([rot, pos[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def to_angle_axis(x, eps=1e-10):
    """Rotation matrix -> (angle, axis) (anim/xform.py:29-37): angle from
    the clipped trace, axis from the skew part. Reference-parity quirk kept
    deliberately: the cosine is clipped to [0, 1] (not [-1, 1]), so angles
    beyond pi/2 clamp to pi/2, exactly as upstream."""
    angle = jnp.arccos(
        jnp.clip((x[..., 0, 0] + x[..., 1, 1] + x[..., 2, 2] - 1.0) / 2.0, 0.0, 1.0)
    )
    axis = jnp.stack(
        [
            x[..., 2, 1] - x[..., 1, 2],
            x[..., 0, 2] - x[..., 2, 0],
            x[..., 1, 0] - x[..., 0, 1],
        ],
        axis=-1,
    ) / ((2.0 * jnp.sin(angle))[..., None] + eps)
    return angle, axis


def from_angle_axis(angle, axis):
    """Rodrigues rotation matrix from (angle, unit axis)
    (anim/xform.py:46-55)."""
    angle = angle[..., None]
    a0, a1, a2 = axis[..., 0:1], axis[..., 1:2], axis[..., 2:3]
    c, s = jnp.cos(angle), jnp.sin(angle)
    t = 1.0 - c
    r0 = jnp.concatenate(
        [c + a0 * a0 * t, a0 * a1 * t - a2 * s, a0 * a2 * t + a1 * s], axis=-1)
    r1 = jnp.concatenate(
        [a0 * a1 * t + a2 * s, c + a1 * a1 * t, a1 * a2 * t - a0 * s], axis=-1)
    r2 = jnp.concatenate(
        [a0 * a2 * t - a1 * s, a1 * a2 * t + a0 * s, c + a2 * a2 * t], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def log(x, eps=1e-10):
    """Half-angle-scaled axis (so(3) log over 2) of a rotation matrix
    (anim/xform.py:18-20)."""
    angle, axis = to_angle_axis(x, eps=eps)
    return (angle / 2.0)[..., None] * axis


def exp(x, eps=1e-10):
    """Inverse of :func:`log` (anim/xform.py:23-26)."""
    halfangle = jnp.sqrt(jnp.sum(x ** 2.0, axis=-1))
    axis = x[..., :3] / (halfangle[..., None] + eps)
    return from_angle_axis(2.0 * halfangle, axis)


def from_basis(x, y, z):
    """Columns x, y, z -> (..., 3, 3) (anim/xform.py:93-94)."""
    return jnp.stack([x, y, z], axis=-1)


def from_euler(e, order="zyx"):
    """Euler angles (..., 3) -> rotation matrix for the six axis orders the
    reference supports (anim/xform.py:58-90)."""
    c, s = jnp.cos(e), jnp.sin(e)
    c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    if order == "xzy":
        rows = [[c1 * c2, -s1, c1 * s2],
                [s0 * s2 + c0 * c2 * s1, c0 * c1, c0 * s1 * s2 - c2 * s0],
                [c2 * s0 * s1 - c0 * s2, c1 * s0, c0 * c2 + s0 * s1 * s2]]
    elif order == "xyz":
        rows = [[c1 * c2, -c1 * s2, s1],
                [c0 * s2 + c2 * s0 * s1, c0 * c2 - s0 * s1 * s2, -c1 * s0],
                [s0 * s2 - c0 * c2 * s1, c2 * s0 + c0 * s1 * s2, c0 * c1]]
    elif order == "yxz":
        rows = [[c0 * c2 + s0 * s1 * s2, c2 * s0 * s1 - c0 * s2, c1 * s0],
                [c1 * s2, c1 * c2, -s1],
                [c0 * s1 * s2 - c2 * s0, c0 * c2 * s1 + s0 * s2, c0 * c1]]
    elif order == "yzx":
        rows = [[c0 * c1, s0 * s2 - c0 * c2 * s1, c2 * s0 + c0 * s1 * s2],
                [s1, c1 * c2, -c1 * s2],
                [-c1 * s0, c0 * s2 + c2 * s0 * s1, c0 * c2 - s0 * s1 * s2]]
    elif order == "zyx":
        rows = [[c0 * c1, c0 * s1 * s2 - c2 * s0, s0 * s2 + c0 * c2 * s1],
                [c1 * s0, c0 * c2 + s0 * s1 * s2, c2 * s0 * s1 - c0 * s2],
                [-s1, c1 * s2, c1 * c2]]
    elif order == "zxy":
        rows = [[c0 * c2 - s0 * s1 * s2, -c1 * s0, c0 * s2 + c2 * s0 * s1],
                [c2 * s0 + c0 * s1 * s2, c0 * c1, s0 * s2 - c0 * c2 * s1],
                [-c1 * s2, s1, c1 * c2]]
    else:
        raise ValueError(f"Unknown ordering: {order}")
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def orthogonalize(x, method="svd", eps=0.0):
    """Project an approximate rotation back onto SO(3)
    (anim/xform.py:97-116).

    ``method='cross'`` reproduces the reference's Gram-Schmidt-by-cross
    construction exactly. ``method='svd'`` is the polar projection
    U @ Vt — the reference's svd branch calls ``mat.svd`` which does not
    exist in anim/mat.py (dead upstream); this one works, with the
    reflection guarded so the result has det +1.
    """
    if method == "cross":
        r0, r1 = x[..., 0], x[..., 1]
        r2 = jnp.cross(r0, r1)
        r0 = r0 / (jnp.linalg.norm(r0, axis=-1)[..., None] + eps)
        r2 = r2 / (jnp.linalg.norm(r2, axis=-1)[..., None] + eps)
        r1 = jnp.cross(r2, r0)
        return from_basis(r0, r1, r2)
    if method == "svd":
        u, _, vt = jnp.linalg.svd(x)
        det = jnp.linalg.det(jnp.matmul(u, vt))
        u = u.at[..., :, -1].multiply(jnp.sign(det)[..., None])
        return jnp.matmul(u, vt)
    raise ValueError(f"Unknown method '{method}'")


def orthogonalize_iterative(ts, R=None, iterations=4, eps=1e-5):
    """Iterative rotation-averaging projection onto SO(3)
    (anim/xform.py:133-153): each sweep rotates R by the net torque of its
    columns toward the target's. Fixed iteration count -> unrolled under
    jit."""
    if R is None:
        R = jnp.broadcast_to(jnp.eye(3, dtype=ts.dtype), ts.shape)
    for _ in range(iterations):
        torque = (
            jnp.cross(R[..., :, 0], ts[..., :, 0])
            + jnp.cross(R[..., :, 1], ts[..., :, 1])
            + jnp.cross(R[..., :, 2], ts[..., :, 2])
        )
        align = jnp.abs(
            jnp.sum(R[..., :, 0] * ts[..., :, 0], axis=-1)
            + jnp.sum(R[..., :, 1] * ts[..., :, 1], axis=-1)
            + jnp.sum(R[..., :, 2] * ts[..., :, 2], axis=-1)
        )[..., None]
        omega = torque / (align + eps)
        w = jnp.linalg.norm(omega, axis=-1)
        R = jnp.matmul(from_angle_axis(w, omega / (w[..., None] + eps)), R,
                       precision=_F32)
    return R
