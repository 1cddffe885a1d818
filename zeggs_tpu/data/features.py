"""Per-clip feature extraction: BVH curves -> canonical pose representation.

Reference semantics: ZEGGS/data_pipeline.py:90-228 (`preprocess_animation`)
and :28-84 (`preprocess_audio`). Implemented on the single jnp math core
(ops.quat / ops.fk), so the identical code runs on host CPU for the corpus
pipeline and on TPU when fused into larger graphs.

Canonical frame: root = Spine2 projected on the ground; root rotation = yaw
of the Hips forward axis; gaze = the median horizontal look-at point at
100 cm. Velocities are one-sided finite differences with the frame-0
extrapolation v[0] = v[1] - (v[3] - v[2]).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fk, mel, quat

_GROUND = jnp.array([1.0, 0.0, 1.0])
_FWD = jnp.array([[0.0, 0.0, 1.0]])
_UNIT_X = jnp.array([1.0, 0.0, 0.0])
_UNIT_Y = jnp.array([0.0, 1.0, 0.0])


@dataclass
class AnimFeatures:
    """Output bundle of `extract_anim_features` (all (T, ...) float32)."""

    root_pos: jnp.ndarray
    root_rot: jnp.ndarray
    root_vel: jnp.ndarray
    root_vrt: jnp.ndarray
    lpos: jnp.ndarray
    lrot: jnp.ndarray
    ltxy: jnp.ndarray
    lvel: jnp.ndarray
    lvrt: jnp.ndarray
    cpos: jnp.ndarray
    crot: jnp.ndarray
    ctxy: jnp.ndarray
    cvel: jnp.ndarray
    cvrt: jnp.ndarray
    gaze_pos: jnp.ndarray
    gaze_dir: jnp.ndarray


def _extrapolate_frame0(v):
    """v[0] := v[1] - (v[3] - v[2]) (data_pipeline.py:149-169)."""
    first = v[1] - (v[3] - v[2])
    return jnp.concatenate([first[None], v[1:]], axis=0)


def _finite_diff(x, dt):
    d = (x[1:] - x[:-1]) / dt
    return _extrapolate_frame0(jnp.concatenate([jnp.zeros_like(d[:1]), d], axis=0))


def _rot_diff_helical(q, dt):
    """Helical angular velocity between consecutive frames."""
    d = quat.to_helical(quat.abs_(quat.mul(q[1:], quat.inv(q[:-1])))) / dt
    return _extrapolate_frame0(jnp.concatenate([jnp.zeros_like(d[:1]), d], axis=0))


def extract_anim_features(
    rotations_deg,
    positions,
    parents,
    names,
    dt,
    order="zyx",
    gaze_distance=100.0,
):
    """Full animation featurizer (data_pipeline.py:90-228).

    Args are the BVH dict fields: rotations in degrees (T, J, 3), positions
    (T, J, 3). Returns an AnimFeatures bundle. The numeric core is jitted
    (static skeleton/dt): eager op-by-op dispatch of the 75-joint FK costs
    >1 s per clip on the serving path; compiled it is ~ms.
    """
    idx = (names.index("Spine2"), names.index("Hips"), names.index("Head"))
    out = _features_core(
        jnp.asarray(rotations_deg, jnp.float32),
        jnp.asarray(positions, jnp.float32),
        parents=tuple(int(p) for p in np.asarray(parents)),
        order=order, idx=idx, dt=float(dt), gaze_distance=float(gaze_distance),
    )
    return AnimFeatures(*out)


@partial(jax.jit, static_argnames=("parents", "order", "idx", "dt", "gaze_distance"))
def _features_core(rotations_deg, positions, *, parents, order, idx, dt, gaze_distance):
    i_spine2, i_hips, i_head = idx

    lrot = quat.unroll(quat.from_euler(jnp.radians(rotations_deg), order))
    lpos = positions

    grot, gpos = fk.fk(lrot, lpos, parents)

    root_pos = gpos[:, i_spine2] * _GROUND

    root_fwd = quat.mul_vec(grot[:, i_hips], _FWD)
    root_fwd = root_fwd * _GROUND
    root_fwd = root_fwd / jnp.sqrt(jnp.sum(root_fwd * root_fwd, axis=-1))[..., None]

    root_rot = quat.normalize(
        quat.between(jnp.broadcast_to(_FWD, root_fwd.shape), root_fwd)
    )

    gaze_lookat = quat.mul_vec(grot[:, i_head], jnp.array([0.0, 0.0, 1.0]))
    gaze_lookat = gaze_lookat * _GROUND
    gaze_lookat = gaze_lookat / jnp.sqrt(jnp.sum(jnp.square(gaze_lookat), axis=-1))[..., None]
    gaze_pos_all = root_pos + gaze_distance * gaze_lookat
    gaze_pos = jnp.broadcast_to(jnp.median(gaze_pos_all, axis=0), root_pos.shape)

    gaze_dir = quat.mul_vec(quat.inv(root_rot), gaze_pos - root_pos)

    # re-express joint 0 relative to the root frame
    lrot = lrot.at[:, 0].set(quat.mul(quat.inv(root_rot), lrot[:, 0]))
    lpos = lpos.at[:, 0].set(quat.mul_vec(quat.inv(root_rot), lpos[:, 0] - root_pos))

    lvel = _finite_diff(lpos, dt)
    lvrt = _rot_diff_helical(lrot, dt)

    # root velocities: world-space diff rotated into the previous frame's
    # root space (frame 0 uses its own frame) — data_pipeline.py:158-169
    root_vrt_w = _rot_diff_helical(root_rot, dt)
    root_vel_w = _finite_diff(root_pos, dt)
    prev_rot = jnp.concatenate([root_rot[:1], root_rot[:-1]], axis=0)
    root_vrt = quat.mul_vec(quat.inv(prev_rot), root_vrt_w)
    root_vel = quat.mul_vec(quat.inv(prev_rot), root_vel_w)

    crot, cpos, cvrt, cvel = fk.fk_vel(lrot, lpos, lvrt, lvel, parents)

    ltxy = jnp.stack(
        [quat.mul_vec(lrot, _UNIT_X), quat.mul_vec(lrot, _UNIT_Y)], axis=-2
    )
    ctxy = jnp.stack(
        [quat.mul_vec(crot, _UNIT_X), quat.mul_vec(crot, _UNIT_Y)], axis=-2
    )

    # field order of AnimFeatures
    return (root_pos, root_rot, root_vel, root_vrt, lpos, lrot, ltxy, lvel,
            lvrt, cpos, crot, ctxy, cvel, cvrt, gaze_pos, gaze_dir)


def preprocess_animation(anim_data, gaze_distance=100.0):
    """Reference-shaped wrapper taking a BVH dict (generate.py:209-225)."""
    return extract_anim_features(
        anim_data["rotations"],
        anim_data["positions"],
        np.asarray(anim_data["parents"]),
        list(anim_data["names"]),
        float(anim_data["frametime"]),
        order=anim_data["order"],
        gaze_distance=gaze_distance,
    )


def preprocess_audio(
    audio_data,
    anim_fs,
    anim_length,
    cfg: mel.MelConfig,
    feature_type=("mel_spec", "energy"),
    normalize_loudness=None,
):
    """Audio featurizer -> (anim_length, n_features) float32.

    ``normalize_loudness`` overrides cfg.normalize_loudness when not None
    (data_pipeline.py:33-39 applies BS.1770 normalization to -20 LUFS).
    """
    do_norm = cfg.normalize_loudness if normalize_loudness is None else normalize_loudness
    audio = np.asarray(audio_data, np.float32)
    if do_norm:
        from ..audio.loudness import normalize_loudness as _norm

        audio = _norm(audio, cfg.sampling_rate, -20.0)
    feats = mel.audio_features(audio, anim_fs, anim_length, cfg, feature_type)
    return np.asarray(feats, np.float32)
