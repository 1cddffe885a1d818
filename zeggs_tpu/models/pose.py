"""Pose vector packing/unpacking and state integration.

Reference semantics: the jit-scripted free functions in
ZEGGS/modules.py:672-742. The canonical layout (SURVEY.md appendix):

  input  (1134) = root_vel(3) | root_vrt(3) | lpos(75*3) | ltxy(75*2*3)
                  | lvel(75*3) | lvrt(75*3) | gaze_dir(3)
  output (1131) = the same minus gaze_dir.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import quat


def vectorize_input(
    root_pos,
    root_rot,
    root_vel,
    root_vrt,
    lpos,
    ltxy,
    lvel,
    lvrt,
    gaze_pos,
    anim_input_mean,
    anim_input_std,
):
    """Flatten one frame of pose state into the normalized 1134-dim network
    input (modules.py:677-713). All args are per-frame, batch-leading.

    Local gaze is the *unnormalized* offset rotated into root space
    (modules.py:695-696 keeps the commented-out normalize disabled).
    """
    b = lpos.shape[0]
    gaze_dir = quat.inv_mul_vec(root_rot, gaze_pos - root_pos)
    pose = jnp.concatenate(
        [
            root_vel.reshape(b, -1),
            root_vrt.reshape(b, -1),
            lpos.reshape(b, -1),
            ltxy.reshape(b, -1),
            lvel.reshape(b, -1),
            lvrt.reshape(b, -1),
            gaze_dir.reshape(b, -1),
        ],
        axis=1,
    )
    return (pose - anim_input_mean) / anim_input_std


def devectorize_output(
    predicted,
    root_pos,
    root_rot,
    njoints,
    dt,
    anim_output_mean,
    anim_output_std,
):
    """Denormalize the 1131-dim prediction, split it, and integrate the root
    (modules.py:716-742):

      root_pos' = R(root_rot) * v dt + root_pos
      root_rot' = exp(R(root_rot) * w dt / 2) ∘ root_rot   (quat_from_helical)
    """
    b = predicted.shape[0]
    p = predicted * anim_output_std + anim_output_mean
    root_vel = p[:, 0:3]
    root_vrt = p[:, 3:6]
    o = 6
    lpos = p[:, o : o + njoints * 3].reshape(b, njoints, 3)
    ltxy = p[:, o + njoints * 3 : o + njoints * 9].reshape(b, njoints, 2, 3)
    lvel = p[:, o + njoints * 9 : o + njoints * 12].reshape(b, njoints, 3)
    lvrt = p[:, o + njoints * 12 : o + njoints * 15].reshape(b, njoints, 3)

    new_root_pos = quat.mul_vec(root_rot, root_vel * dt) + root_pos
    new_root_rot = quat.mul(
        quat.from_helical(quat.mul_vec(root_rot, root_vrt * dt)), root_rot
    )
    return new_root_pos, new_root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt


def example_feature_vec(root_vel, root_vrt, lpos, ltxy, lvel, lvrt):
    """Per-frame 1134-dim style-example features with a zero gaze slot
    (generate.py:239-256, dataset.py:188-196)."""
    t = root_vel.shape[0]
    return jnp.concatenate(
        [
            root_vel.reshape(t, -1),
            root_vrt.reshape(t, -1),
            lpos.reshape(t, -1),
            ltxy.reshape(t, -1),
            lvel.reshape(t, -1),
            lvrt.reshape(t, -1),
            jnp.zeros((t, 3), root_vel.dtype),
        ],
        axis=1,
    )
