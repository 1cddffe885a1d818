"""Animation featurizer invariants (reference semantics of
data_pipeline.py:90-228 checked through self-consistency identities)."""

import numpy as np

import jax.numpy as jnp

from zeggs_tpu.data import features as F
from zeggs_tpu.ops import quat
from tests.synthetic import make_motion, BONE_NAMES


def feats():
    anim = make_motion(nframes=100, seed=4)
    return anim, F.preprocess_animation(anim)


def test_root_is_ground_projected():
    _, f = feats()
    np.testing.assert_allclose(np.asarray(f.root_pos)[:, 1], 0.0, atol=1e-6)


def test_root_rot_is_yaw_only():
    """root_rot rotates +z to the horizontal hips-forward direction; it must
    keep the y axis fixed (pure yaw)."""
    _, f = feats()
    y = np.asarray(quat.mul_vec(jnp.asarray(f.root_rot), jnp.array([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(y, np.tile([0, 1, 0], (len(y), 1)), atol=1e-5)


def test_velocity_finite_difference_consistency():
    anim, f = feats()
    dt = anim["frametime"]
    lpos = np.asarray(f.lpos)
    lvel = np.asarray(f.lvel)
    fd = (lpos[2] - lpos[1]) / dt
    np.testing.assert_allclose(lvel[2], fd, atol=1e-3)
    # frame-0 extrapolation: v0 = v1 - (v3 - v2)
    np.testing.assert_allclose(lvel[0], lvel[1] - (lvel[3] - lvel[2]), atol=1e-4)


def test_gaze_dir_roundtrip():
    """gaze_dir is the *unnormalized* offset in root space:
    R(root_rot) gaze_dir + root_pos == gaze_pos."""
    _, f = feats()
    back = np.asarray(quat.mul_vec(jnp.asarray(f.root_rot), jnp.asarray(f.gaze_dir))) + np.asarray(
        f.root_pos
    )
    np.testing.assert_allclose(back, np.asarray(f.gaze_pos), atol=1e-2)


def test_gaze_pos_constant_median():
    _, f = feats()
    g = np.asarray(f.gaze_pos)
    assert np.allclose(g, g[0:1], atol=1e-6)  # per-clip constant (median)


def test_ltxy_are_rotation_columns():
    _, f = feats()
    m = np.asarray(quat.to_xform(jnp.asarray(f.lrot)))
    ltxy = np.asarray(f.ltxy)
    np.testing.assert_allclose(ltxy[..., 0, :], m[..., :, 0], atol=1e-5)
    np.testing.assert_allclose(ltxy[..., 1, :], m[..., :, 1], atol=1e-5)


def test_character_space_consistency():
    """cpos from fk_vel equals plain FK of the root-relative joints."""
    _, f = feats()
    from zeggs_tpu.ops import fk

    gr, gp = fk.fk(jnp.asarray(f.lrot), jnp.asarray(f.lpos), [-1, 0, 1, 2, 3, 4, 3, 3])
    np.testing.assert_allclose(np.asarray(gp), np.asarray(f.cpos), atol=1e-4)


def test_root_relative_reexpression():
    """Joint 0 re-expression: R(root_rot) lpos0 + root_pos == original hips
    global position."""
    anim, f = feats()
    hips_world = anim["positions"][:, 0]
    back = np.asarray(
        quat.mul_vec(jnp.asarray(f.root_rot), jnp.asarray(f.lpos)[:, 0])
    ) + np.asarray(f.root_pos)
    np.testing.assert_allclose(back, hips_world, atol=1e-3)
