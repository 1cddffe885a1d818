"""Quaternion algebra as pure jnp functions.

One core library replacing the reference's duplicated NumPy/TorchScript math
(reference: ZEGGS/anim/quat.py and ZEGGS/anim/tquat.py). Every function is
shape-polymorphic over leading batch dims ("..." below), `vmap`/`jit`
friendly, and differentiable (safe-where guards around norms so gradients
never produce NaNs at the small-angle branch).

Quaternions are stored (w, x, y, z) in the last axis, matching the reference
layout (ZEGGS/anim/quat.py:17-25).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_XNEG = jnp.array([1.0, -1.0, -1.0, -1.0], dtype=jnp.float32)


def eye(shape=(), dtype=jnp.float32):
    """Identity quaternion broadcast to ``shape + (4,)``."""
    q = jnp.array([1, 0, 0, 0], dtype=dtype)
    if shape == () or shape == []:
        return q
    return jnp.broadcast_to(q, tuple(shape) + (4,))


def mul(x, y):
    """Hamilton product x*y (reference: anim/quat.py:17-25)."""
    x0, x1, x2, x3 = x[..., 0:1], x[..., 1:2], x[..., 2:3], x[..., 3:4]
    y0, y1, y2, y3 = y[..., 0:1], y[..., 1:2], y[..., 2:3], y[..., 3:4]
    return jnp.concatenate(
        [
            y0 * x0 - y1 * x1 - y2 * x2 - y3 * x3,
            y0 * x1 + y1 * x0 - y2 * x3 + y3 * x2,
            y0 * x2 + y1 * x3 + y2 * x0 - y3 * x1,
            y0 * x3 - y1 * x2 + y2 * x1 + y3 * x0,
        ],
        axis=-1,
    )


def mul_vec(q, v):
    """Rotate vector(s) v by quaternion(s) q (anim/quat.py:36-38)."""
    t = 2.0 * jnp.cross(q[..., 1:], v)
    return v + q[..., 0:1] * t + jnp.cross(q[..., 1:], t)


def inv(x):
    """Conjugate (inverse for unit quats) (anim/quat.py:45-46)."""
    return _XNEG.astype(x.dtype) * x


def inv_mul(x, y):
    return mul(inv(x), y)


def inv_mul_vec(q, v):
    return mul_vec(inv(q), v)


def abs_(x):
    """Force hemisphere with non-negative w (anim/quat.py:49-50)."""
    return jnp.where(x[..., 0:1] > 0.0, x, -x)


def diff(x, y, world=True):
    """Rotation taking y to x, sign-aligned (anim/quat.py:86-89)."""
    d = jnp.sum(x * y, axis=-1, keepdims=True)
    flip = jnp.where(d > 0.0, x, -x)
    return mul(flip, inv(y)) if world else mul(inv(y), flip)


def normalize(x, eps=0.0):
    """x / (|x| + eps) (anim/quat.py:92-93; tquat.py uses eps=1e-5)."""
    return x / (jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + eps)


def log(x, eps=1e-5):
    """Quaternion log map -> R^3 half-angle vector (anim/quat.py:53-56).

    Returns x[..., 1:] scaled by atan2(|xyz|, w)/|xyz|, with the scale
    snapped to 1 when |xyz| < eps (same small-angle branch as reference).
    """
    sq = jnp.sum(jnp.square(x[..., 1:]), axis=-1, keepdims=True)
    length = jnp.sqrt(sq)
    # Guard the division so the untaken branch can't emit NaN gradients.
    safe = jnp.where(length < eps, jnp.ones_like(length), length)
    halfangle = jnp.where(
        length < eps, jnp.ones_like(length), jnp.arctan2(length, x[..., 0:1]) / safe
    )
    return halfangle * x[..., 1:]


def exp(x, eps=1e-5):
    """Quaternion exp map from R^3 half-angle vector (anim/tquat.py:93-98).

    Uses the TorchScript semantics (the variant the decoder integrates with):
    the small-angle branch returns normalize([1, x]) while the main branch is
    [cos|x|, x * sinc(|x|/pi)].
    """
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    halfangle = jnp.sqrt(sq)
    small = halfangle < eps
    big = jnp.concatenate(
        [jnp.cos(halfangle), x * jnp.sinc(halfangle / math.pi)], axis=-1
    )
    tiny = normalize(jnp.concatenate([jnp.ones_like(halfangle), x], axis=-1), eps=eps)
    return jnp.where(small, tiny, big)


def exp_np_style(x, eps=1e-5):
    """NumPy-reference exp variant (anim/quat.py:59-63): small branch [1, x]."""
    halfangle = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    c = jnp.where(halfangle < eps, jnp.ones_like(halfangle), jnp.cos(halfangle))
    s = jnp.where(
        halfangle < eps, jnp.ones_like(halfangle), jnp.sinc(halfangle / math.pi)
    )
    return jnp.concatenate([c, s * x], axis=-1)


def to_helical(x, eps=1e-5):
    return 2.0 * log(x, eps)


def from_helical(x, eps=1e-5):
    return exp(x / 2.0, eps)


def to_angle_axis(x, eps=1e-10):
    length = jnp.sqrt(jnp.sum(jnp.square(x[..., 1:]), axis=-1))
    angle = 2.0 * jnp.arctan2(length, x[..., 0])
    return angle, x[..., 1:] / (length[..., None] + eps)


def from_angle_axis(angle, axis):
    c = jnp.cos(angle / 2.0)[..., None]
    s = jnp.sin(angle / 2.0)[..., None]
    return jnp.concatenate([c, s * axis], axis=-1)


def between(x, y):
    """Quaternion rotating direction x to direction y (anim/quat.py:96-100)."""
    w = (
        jnp.sqrt(jnp.sum(x * x, axis=-1) * jnp.sum(y * y, axis=-1))[..., None]
        + jnp.sum(x * y, axis=-1)[..., None]
    )
    return jnp.concatenate([w, jnp.cross(x, y)], axis=-1)


def slerp(x, y, a, eps=1e-10):
    l = jnp.sum(x * y, axis=-1)
    o = jnp.arccos(jnp.clip(l, -1.0, 1.0))
    a0 = jnp.sin((1.0 - a) * o) / (jnp.sin(o) + eps)
    a1 = jnp.sin(a * o) / (jnp.sin(o) + eps)
    return a0[..., None] * x + a1[..., None] * y


def to_euler(x, order="zyx"):
    """Quaternion -> Euler angles, zyx/xzy orders (anim/quat.py:111-127)."""
    x0, x1, x2, x3 = x[..., 0:1], x[..., 1:2], x[..., 2:3], x[..., 3:4]
    if order == "zyx":
        return jnp.concatenate(
            [
                jnp.arctan2(2.0 * (x0 * x3 + x1 * x2), 1.0 - 2.0 * (x2 * x2 + x3 * x3)),
                jnp.arcsin(jnp.clip(2.0 * (x0 * x2 - x3 * x1), -1.0, 1.0)),
                jnp.arctan2(2.0 * (x0 * x1 + x2 * x3), 1.0 - 2.0 * (x1 * x1 + x2 * x2)),
            ],
            axis=-1,
        )
    elif order == "xzy":
        return jnp.concatenate(
            [
                jnp.arctan2(
                    2.0 * (x1 * x0 - x2 * x3), -x1 * x1 + x2 * x2 - x3 * x3 + x0 * x0
                ),
                jnp.arctan2(
                    2.0 * (x2 * x0 - x1 * x3), x1 * x1 - x2 * x2 - x3 * x3 + x0 * x0
                ),
                jnp.arcsin(jnp.clip(2.0 * (x1 * x2 + x3 * x0), -1.0, 1.0)),
            ],
            axis=-1,
        )
    raise NotImplementedError(f"Cannot convert to ordering {order}")


_AXIS = {
    "x": jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32),
    "y": jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32),
    "z": jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32),
}


def from_euler(e, order="zyx"):
    """Euler angles (radians) -> quaternion (anim/quat.py:154-163)."""
    q0 = from_angle_axis(e[..., 0], _AXIS[order[0]])
    q1 = from_angle_axis(e[..., 1], _AXIS[order[1]])
    q2 = from_angle_axis(e[..., 2], _AXIS[order[2]])
    return mul(q0, mul(q1, q2))


def to_xform(x):
    """Quaternion -> 3x3 rotation matrix (anim/quat.py:139-151)."""
    qw, qx, qy, qz = x[..., 0:1], x[..., 1:2], x[..., 2:3], x[..., 3:4]
    x2, y2, z2 = qx + qx, qy + qy, qz + qz
    xx, yy, wx = qx * x2, qy * y2, qw * x2
    xy, yz, wy = qx * y2, qy * z2, qw * y2
    xz, zz, wz = qx * z2, qz * z2, qw * z2
    return jnp.concatenate(
        [
            jnp.concatenate([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1)[..., None, :],
            jnp.concatenate([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1)[..., None, :],
            jnp.concatenate([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1)[..., None, :],
        ],
        axis=-2,
    )


def to_xy(x):
    """Quaternion -> first two columns of the rotation matrix, i.e. the
    (3, 2) "rot6d" representation transposed as rows (anim/tquat.py:69-83).
    Output shape (..., 3, 2) stacked as rows of [x-col | y-col]."""
    qw, qx, qy, qz = x[..., 0:1], x[..., 1:2], x[..., 2:3], x[..., 3:4]
    x2, y2, z2 = qx + qx, qy + qy, qz + qz
    xx, yy, wx = qx * x2, qy * y2, qw * x2
    xy, yz, wy = qx * y2, qy * z2, qw * y2
    xz, zz, wz = qx * z2, qz * z2, qw * z2
    return jnp.concatenate(
        [
            jnp.concatenate([1.0 - (yy + zz), xy - wz], axis=-1)[..., None, :],
            jnp.concatenate([xy + wz, 1.0 - (xx + zz)], axis=-1)[..., None, :],
            jnp.concatenate([xz - wy, yz + wx], axis=-1)[..., None, :],
        ],
        axis=-2,
    )


def from_xform(ts, eps=1e-10):
    """3x3 rotation matrix -> quaternion, 4-branch select (anim/quat.py:166-206)."""
    t = ts[..., 0, 0] + ts[..., 1, 1] + ts[..., 2, 2]

    s = 0.5 / jnp.sqrt(jnp.maximum(t + 1, eps))
    q_w = jnp.stack(
        [
            0.25 / s,
            s * (ts[..., 2, 1] - ts[..., 1, 2]),
            s * (ts[..., 0, 2] - ts[..., 2, 0]),
            s * (ts[..., 1, 0] - ts[..., 0, 1]),
        ],
        axis=-1,
    )

    s0 = 2.0 * jnp.sqrt(jnp.maximum(1.0 + ts[..., 0, 0] - ts[..., 1, 1] - ts[..., 2, 2], eps))
    q_x = jnp.stack(
        [
            (ts[..., 2, 1] - ts[..., 1, 2]) / s0,
            s0 * 0.25,
            (ts[..., 0, 1] + ts[..., 1, 0]) / s0,
            (ts[..., 0, 2] + ts[..., 2, 0]) / s0,
        ],
        axis=-1,
    )

    s1 = 2.0 * jnp.sqrt(jnp.maximum(1.0 + ts[..., 1, 1] - ts[..., 0, 0] - ts[..., 2, 2], eps))
    q_y = jnp.stack(
        [
            (ts[..., 0, 2] - ts[..., 2, 0]) / s1,
            (ts[..., 0, 1] + ts[..., 1, 0]) / s1,
            s1 * 0.25,
            (ts[..., 1, 2] + ts[..., 2, 1]) / s1,
        ],
        axis=-1,
    )

    s2 = 2.0 * jnp.sqrt(jnp.maximum(1.0 + ts[..., 2, 2] - ts[..., 0, 0] - ts[..., 1, 1], eps))
    q_z = jnp.stack(
        [
            (ts[..., 1, 0] - ts[..., 0, 1]) / s2,
            (ts[..., 0, 2] + ts[..., 2, 0]) / s2,
            (ts[..., 1, 2] + ts[..., 2, 1]) / s2,
            s2 * 0.25,
        ],
        axis=-1,
    )

    c0 = (ts[..., 0, 0] > ts[..., 1, 1]) & (ts[..., 0, 0] > ts[..., 2, 2])
    c1 = (~c0) & (ts[..., 1, 1] > ts[..., 2, 2])
    c2 = (~c0) & (~c1)

    pos = (t > 0)[..., None]
    qs = jnp.where(pos, q_w, jnp.zeros_like(q_w))
    qs = jnp.where((~(t > 0) & c0)[..., None], q_x, qs)
    qs = jnp.where((~(t > 0) & c1)[..., None], q_y, qs)
    qs = jnp.where((~(t > 0) & c2)[..., None], q_z, qs)
    return qs


def unroll(x):
    """Hemisphere-align a quaternion track over its leading (time) axis
    (anim/quat.py:130-136), as a `lax.scan` instead of a Python frame loop."""

    def step(prev, cur):
        d = jnp.sum(cur * prev, axis=-1, keepdims=True)
        y = jnp.where(d < 0.0, -cur, cur)
        return y, y

    first = x[0]
    _, rest = jax.lax.scan(step, first, x[1:])
    return jnp.concatenate([first[None], rest], axis=0)


def mul_scalar(x, y):
    """Scale a rotation by scalar factor y via slerp from identity
    (anim/quat.py:41-42)."""
    return slerp(eye(x.shape[:-1], dtype=x.dtype), x, y)
