"""Forward kinematics over a joint tree, traced once under XLA.

Reference semantics: ZEGGS/anim/quat.py:209-228 (NumPy), ZEGGS/anim/tquat.py
:137-172 and ZEGGS/anim/txform.py:10-20 (TorchScript). The reference walks
the 75-joint tree with a Python loop dispatching one kernel per joint per
call; here the walk is unrolled at *trace* time (parents are static
Python ints), so XLA sees one fused graph and the per-joint ops vectorize
over every leading batch/time axis.

Joint axis is -2 for vectors/quats and -3 for matrices.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import quat
from . import xform as xf


def _parents_tuple(parents):
    if isinstance(parents, (tuple, list)):
        return tuple(int(p) for p in parents)
    return tuple(int(p) for p in np.asarray(parents))


def mat3_mul(a, b):
    """(..., 3, 3) @ (..., 3, 3) as broadcast multiply-adds.

    TPU note: `jnp.matmul` on 3x3 matrices pads each operand onto MXU tiles
    (8x128 minimum) — a ~1000x FLOP blow-up when the batch lives in leading
    dims. Expressing the contraction as VPU elementwise ops keeps the batch
    vectorized along the lane dimension instead.
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def mat3_vec(a, v):
    """(..., 3, 3) @ (..., 3) -> (..., 3) on the VPU (see mat3_mul)."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def fk(lrot, lpos, parents):
    """Local->global rotations and positions (anim/quat.py:209-215)."""
    parents = _parents_tuple(parents)
    gp = [lpos[..., :1, :]]
    gr = [lrot[..., :1, :]]
    for i in range(1, len(parents)):
        p = parents[i]
        gp.append(quat.mul_vec(gr[p], lpos[..., i : i + 1, :]) + gp[p])
        gr.append(quat.mul(gr[p], lrot[..., i : i + 1, :]))
    return jnp.concatenate(gr, axis=-2), jnp.concatenate(gp, axis=-2)


def fk_vel(lrot, lpos, lvrt, lvel, parents):
    """FK with angular/linear velocity propagation (anim/quat.py:218-228).

    gv_i = gv_p + R_p v_i + (gt_p × R_p x_i);  gt_i = gt_p + R_p w_i.
    """
    parents = _parents_tuple(parents)
    gp = [lpos[..., :1, :]]
    gr = [lrot[..., :1, :]]
    gt = [lvrt[..., :1, :]]
    gv = [lvel[..., :1, :]]
    for i in range(1, len(parents)):
        p = parents[i]
        rp = gr[p]
        xi = quat.mul_vec(rp, lpos[..., i : i + 1, :])
        gp.append(xi + gp[p])
        gr.append(quat.mul(rp, lrot[..., i : i + 1, :]))
        gt.append(gt[p] + quat.mul_vec(rp, lvrt[..., i : i + 1, :]))
        gv.append(gv[p] + quat.mul_vec(rp, lvel[..., i : i + 1, :]) + jnp.cross(gt[p], xi))
    return (
        jnp.concatenate(gr, axis=-2),
        jnp.concatenate(gp, axis=-2),
        jnp.concatenate(gt, axis=-2),
        jnp.concatenate(gv, axis=-2),
    )


def ik_rot(grot, parents):
    """Global->local rotations (anim/tquat.py:130-135)."""
    parents = _parents_tuple(parents)
    lr = [grot[..., :1, :]]
    for i in range(1, len(parents)):
        p = parents[i]
        lr.append(quat.mul(quat.inv(grot[..., p : p + 1, :]), grot[..., i : i + 1, :]))
    return jnp.concatenate(lr, axis=-2)


def xform_fk_vel(lxform, lpos, lvrt, lvel, parents):
    """Matrix-form FK with velocities (anim/txform.py:10-20).

    ``lxform``: (..., J, 3, 3) local rotation matrices. Used by the training
    loss on orthogonalized rot6d predictions so gradients flow through the
    matrix product chain exactly as in the reference (train.py:325-330).
    """
    parents = _parents_tuple(parents)
    gr = [lxform[..., :1, :, :]]
    gp = [lpos[..., :1, :]]
    gt = [lvrt[..., :1, :]]
    gv = [lvel[..., :1, :]]
    for i in range(1, len(parents)):
        p = parents[i]
        rp = gr[p]
        xi = mat3_vec(rp, lpos[..., i : i + 1, :])
        gp.append(gp[p] + xi)
        gr.append(mat3_mul(rp, lxform[..., i : i + 1, :, :]))
        gt.append(gt[p] + mat3_vec(rp, lvrt[..., i : i + 1, :]))
        gv.append(gv[p] + mat3_vec(rp, lvel[..., i : i + 1, :]) + jnp.cross(gt[p], xi))
    return (
        jnp.concatenate(gr, axis=-3),
        jnp.concatenate(gp, axis=-2),
        jnp.concatenate(gt, axis=-2),
        jnp.concatenate(gv, axis=-2),
    )


def fk_root_position(gpos, grot, lpos, parents):
    """Global positions from global rotations + root position
    (anim/tquat.py:161-165)."""
    parents = _parents_tuple(parents)
    gp = [gpos[..., :1, :]]
    for i in range(1, len(parents)):
        p = parents[i]
        gp.append(quat.mul_vec(grot[..., p : p + 1, :], lpos[..., i : i + 1, :]) + gp[p])
    return jnp.concatenate(gp, axis=-2)
