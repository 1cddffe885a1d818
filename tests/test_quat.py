"""Unit tests for the quaternion core against closed-form identities and
scipy.spatial.transform.Rotation (independent ground truth, not reference
code)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from zeggs_tpu.ops import quat

RNG = np.random.default_rng(0)


def random_quats(shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q):
    # ours is (w, x, y, z); scipy is (x, y, z, w)
    return R.from_quat(np.concatenate([q[..., 1:], q[..., :1]], axis=-1).reshape(-1, 4))


def test_mul_vec_matches_scipy():
    q = random_quats((32,))
    v = RNG.normal(size=(32, 3)).astype(np.float32)
    ours = np.asarray(quat.mul_vec(q, v))
    ref = to_scipy(q).apply(v)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mul_composition_identity():
    x = random_quats((16,))
    y = random_quats((16,))
    v = RNG.normal(size=(16, 3)).astype(np.float32)
    lhs = np.asarray(quat.mul_vec(quat.mul(x, y), v))
    rhs = np.asarray(quat.mul_vec(x, quat.mul_vec(y, v)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_inv_is_inverse():
    q = random_quats((8,))
    ident = np.asarray(quat.mul(q, quat.inv(q)))
    expected = np.tile(np.array([1, 0, 0, 0], np.float32), (8, 1))
    np.testing.assert_allclose(ident, expected, atol=1e-5)


def test_to_xform_matches_scipy():
    q = random_quats((20,))
    ours = np.asarray(quat.to_xform(q))
    ref = to_scipy(q).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_from_xform_roundtrip():
    q = random_quats((64,))
    m = np.asarray(quat.to_xform(q))
    q2 = np.asarray(quat.from_xform(m))
    # quaternion double-cover: compare up to sign
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_euler_roundtrip_zyx():
    q = random_quats((50,))
    e = np.asarray(quat.to_euler(q, order="zyx"))
    q2 = np.asarray(quat.from_euler(e, order="zyx"))
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_to_euler_xzy_matches_scipy():
    # The reference's 'xzy' formula returns the (x, y, z) angle triple of
    # the *extrinsic* xzy decomposition (scipy 'xzy' returns (x, z, y));
    # note it is NOT the inverse of from_euler('xzy') — a reference quirk
    # we reproduce faithfully (anim/quat.py:120-125).
    q = random_quats((20,))
    ours = np.asarray(quat.to_euler(q, order="xzy"))
    sp = to_scipy(q).as_euler("xzy")
    np.testing.assert_allclose(ours[:, 0], sp[:, 0], atol=1e-5)
    np.testing.assert_allclose(ours[:, 1], sp[:, 2], atol=1e-5)
    np.testing.assert_allclose(ours[:, 2], sp[:, 1], atol=1e-5)


def test_from_euler_matches_scipy():
    e = RNG.uniform(-1.5, 1.5, size=(30, 3)).astype(np.float32)
    ours = np.asarray(quat.from_euler(e, order="zyx"))
    # reference applies order[0] about axis order[0] first in the product
    # chain q0*(q1*q2): extrinsic zyx == scipy intrinsic 'ZYX' with angles
    # in the same order.
    ref = R.from_euler("ZYX", e[:, [0, 1, 2]])
    ref_q = ref.as_quat()  # (x, y, z, w)
    ref_wxyz = np.concatenate([ref_q[:, 3:], ref_q[:, :3]], axis=-1)
    dot = np.abs(np.sum(ours * ref_wxyz, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_exp_log_roundtrip():
    v = RNG.normal(size=(40, 3)).astype(np.float32) * 0.5
    q = np.asarray(quat.exp(v))
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    v2 = np.asarray(quat.log(q))
    np.testing.assert_allclose(v, v2, atol=1e-4)


def test_exp_small_angle():
    v = np.zeros((3, 3), np.float32)
    v[1] = 1e-7
    q = np.asarray(quat.exp(v))
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-5)


def test_helical_roundtrip():
    q = random_quats((25,))
    q = np.asarray(quat.abs_(q))  # helical is hemisphere-sensitive
    h = np.asarray(quat.to_helical(q))
    q2 = np.asarray(quat.from_helical(h))
    np.testing.assert_allclose(q, q2, atol=1e-4)


def test_between():
    x = RNG.normal(size=(15, 3)).astype(np.float32)
    y = RNG.normal(size=(15, 3)).astype(np.float32)
    q = np.asarray(quat.normalize(quat.between(x, y)))
    x_rot = np.asarray(quat.mul_vec(q, x))
    # direction of rotated x should match direction of y
    xn = x_rot / np.linalg.norm(x_rot, axis=-1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=-1, keepdims=True)
    np.testing.assert_allclose(xn, yn, atol=1e-4)


def test_unroll_consecutive_dots_nonnegative():
    q = random_quats((100, 5))
    # introduce random sign flips
    signs = RNG.choice([-1.0, 1.0], size=(100, 5, 1)).astype(np.float32)
    q = q * signs
    u = np.asarray(quat.unroll(q))
    dots = np.sum(u[1:] * u[:-1], axis=-1)
    assert (dots >= -1e-6).all()
    # unrolled quats represent the same rotations
    np.testing.assert_allclose(np.abs(np.sum(u * q, axis=-1)), 1.0, atol=1e-5)


def test_slerp_endpoints():
    x = random_quats((10,))
    y = random_quats((10,))
    np.testing.assert_allclose(np.asarray(quat.slerp(x, y, 0.0)), x, atol=1e-3)
    np.testing.assert_allclose(np.asarray(quat.slerp(x, y, 1.0)), y, atol=1e-3)


def test_diff():
    x = random_quats((12,))
    y = random_quats((12,))
    d = np.asarray(quat.diff(x, y, world=True))
    # d * y should equal x up to sign
    x2 = np.asarray(quat.mul(d, y))
    dot = np.abs(np.sum(x * x2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_to_xy_is_xform_columns():
    q = random_quats((9,))
    m = np.asarray(quat.to_xform(q))
    xy = np.asarray(quat.to_xy(q))
    np.testing.assert_allclose(xy, m[..., :2], atol=1e-6)
