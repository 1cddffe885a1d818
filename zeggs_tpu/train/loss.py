"""The ZeroEGGS training loss: 17 weighted L1 terms + annealed KL.

Reference semantics: ZEGGS/train.py:276-421 (reconstruction + world-space
re-expression + FK + finite-difference terms) and ZEGGS/modules.py:745-789
(KL divergence with generalized-logistic annealing, capped at 0.2).

Faithfulness notes (SURVEY.md §7 hard parts):
  * The world-space velocity re-expression uses the *previous* frame's root
    rotation for frames 1.. and frame 0's own rotation for frame 0
    (train.py:281-293) — replicated exactly, including the fact that the
    same shifted convention feeds the joint-0 update.
  * Gaze loss normalizes the gaze offset (train.py:336-337) even though the
    decoder input does not (modules.py:696).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import fk, quat, xform


def _normalize(x, eps=1e-8):
    """modules.py:672-674."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def _shifted_world_vel(root_rot, vec):
    """Rotate per-frame root-space vectors into world space using the
    previous frame's rotation (frame 0 uses its own) — train.py:281-293."""
    v0 = quat.mul_vec(root_rot[:, 0:1], vec[:, 0:1])
    v1 = quat.mul_vec(root_rot[:, :-1], vec[:, 1:])
    return jnp.concatenate([v0, v1], axis=1)


def world_space_reexpression(root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt):
    """Compute (lmat, lpos, lvel, lvrt, world root_vel/vrt) with joint 0
    re-expressed in world space (train.py:277-322)."""
    lmat = xform.orthogonalize_from_xy(ltxy)

    root_vel_w = _shifted_world_vel(root_rot, root_vel)
    root_vrt_w = _shifted_world_vel(root_rot, root_vrt)

    l0_pos = quat.mul_vec(root_rot, lpos[:, :, 0]) + root_pos
    l0_mat = fk.mat3_mul(quat.to_xform(root_rot), lmat[:, :, 0])
    l0_vel = (
        root_vel_w
        + quat.mul_vec(root_rot, lvel[:, :, 0])
        + jnp.cross(root_vrt_w, quat.mul_vec(root_rot, lpos[:, :, 0]))
    )
    l0_vrt = root_vrt_w + quat.mul_vec(root_rot, lvrt[:, :, 0])

    lpos = jnp.concatenate([l0_pos[:, :, None], lpos[:, :, 1:]], axis=2)
    lmat = jnp.concatenate([l0_mat[:, :, None], lmat[:, :, 1:]], axis=2)
    lvel = jnp.concatenate([l0_vel[:, :, None], lvel[:, :, 1:]], axis=2)
    lvrt = jnp.concatenate([l0_vrt[:, :, None], lvrt[:, :, 1:]], axis=2)
    return lmat, lpos, lvel, lvrt, root_vel_w, root_vrt_w


def generalized_logistic_function(x, center=0.0, growth=1.0, lower=0.0, upper=1.0, c=1.0, q=1.0, nu=1.0):
    """Richards curve (modules.py:745-761)."""
    return lower + (upper - lower) / (c + q * jnp.exp(-growth * (x - center))) ** (1.0 / nu)


def kl_divergence(mu, logvar, iteration, center=7500.0, growth=0.005, cap=0.2):
    """VAE KL + annealed weight (modules.py:764-789). Returns (kl, weight)."""
    kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    kl = jnp.mean(kl)
    w = generalized_logistic_function(jnp.float32(iteration), center=center, growth=growth)
    return kl, jnp.minimum(w, cap)


# term weights (train.py:340-395)
_WEIGHTS = dict(
    root_pos=0.1, root_rot=10.0, root_vel=0.1, root_vrt=5.0,
    lpos=15.0, lrot=15.0, lvel=10.0, lvrt=7.0,
    cpos=0.1, crot=3.0, cvel=0.06, cvrt=1.25,
    ldvl=7.0, ldvt=8.0, cdvl=0.06, cdvt=1.25,
    gaze=10.0,
)


def _l1(w, a, b):
    return jnp.mean(jnp.abs(w * (a - b)))


def _dv(w, a, b, dt):
    return jnp.mean(jnp.abs(w * ((a[:, 1:] - a[:, :-1]) / dt - (b[:, 1:] - b[:, :-1]) / dt)))


def compute_loss(outputs, targets, gaze_pos, parents, dt, mu=None, logvar=None, iteration=0):
    """Full training loss.

    outputs / targets: dicts with keys root_pos, root_rot, root_vel,
    root_vrt, lpos, ltxy, lvel, lvrt — each (B, T, ...). gaze_pos (B, T, 3)
    is the ground-truth gaze used for both sides (train.py:336-337).

    Returns (loss, metrics dict).
    """
    O = outputs
    W = targets

    o_lmat, o_lpos, o_lvel, o_lvrt, o_rvel_w, o_rvrt_w = world_space_reexpression(
        O["root_pos"], O["root_rot"], O["root_vel"], O["root_vrt"],
        O["lpos"], O["ltxy"], O["lvel"], O["lvrt"],
    )
    w_lmat, w_lpos, w_lvel, w_lvrt, w_rvel_w, w_rvrt_w = world_space_reexpression(
        W["root_pos"], W["root_rot"], W["root_vel"], W["root_vrt"],
        W["lpos"], W["ltxy"], W["lvel"], W["lvrt"],
    )

    w_cmat, w_cpos, w_cvrt, w_cvel = fk.xform_fk_vel(w_lmat, w_lpos, w_lvrt, w_lvel, parents)
    o_cmat, o_cpos, o_cvrt, o_cvel = fk.xform_fk_vel(o_lmat, o_lpos, o_lvrt, o_lvel, parents)

    o_root_mat = quat.to_xform(O["root_rot"])
    w_root_mat = quat.to_xform(W["root_rot"])

    w_gaze_dir = quat.inv_mul_vec(W["root_rot"], _normalize(gaze_pos - W["root_pos"]))
    o_gaze_dir = quat.inv_mul_vec(O["root_rot"], _normalize(gaze_pos - O["root_pos"]))

    m = {
        "loss_root_pos": _l1(_WEIGHTS["root_pos"], O["root_pos"], W["root_pos"]),
        "loss_root_rot": _l1(_WEIGHTS["root_rot"], o_root_mat, w_root_mat),
        "loss_root_vel": _l1(_WEIGHTS["root_vel"], o_rvel_w, w_rvel_w),
        "loss_root_vrt": _l1(_WEIGHTS["root_vrt"], o_rvrt_w, w_rvrt_w),
        "loss_lpos": _l1(_WEIGHTS["lpos"], o_lpos, w_lpos),
        "loss_lrot": _l1(_WEIGHTS["lrot"], O["ltxy"], W["ltxy"]),
        "loss_lvel": _l1(_WEIGHTS["lvel"], o_lvel, w_lvel),
        "loss_lvrt": _l1(_WEIGHTS["lvrt"], o_lvrt, w_lvrt),
        "loss_cpos": _l1(_WEIGHTS["cpos"], o_cpos, w_cpos),
        "loss_crot": _l1(_WEIGHTS["crot"], o_cmat, w_cmat),
        "loss_cvel": _l1(_WEIGHTS["cvel"], o_cvel, w_cvel),
        "loss_cvrt": _l1(_WEIGHTS["cvrt"], o_cvrt, w_cvrt),
        "loss_ldvl": _dv(_WEIGHTS["ldvl"], o_lpos, w_lpos, dt),
        "loss_ldvt": _dv(_WEIGHTS["ldvt"], O["ltxy"], W["ltxy"], dt),
        "loss_cdvl": _dv(_WEIGHTS["cdvl"], o_cpos, w_cpos, dt),
        "loss_cdvt": _dv(_WEIGHTS["cdvt"], o_cmat, w_cmat, dt),
        "loss_gaze": _l1(_WEIGHTS["gaze"], o_gaze_dir, w_gaze_dir),
    }

    loss_kl = jnp.float32(0.0)
    if mu is not None and logvar is not None:
        kl, w_kl = kl_divergence(mu, logvar, iteration)
        loss_kl = w_kl * kl
    m["loss_kl_div"] = loss_kl

    loss = sum(m.values()) / 18.0
    m["total_loss"] = loss
    return loss, m
