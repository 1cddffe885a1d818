"""Unit tests for the rotation-matrix / homogeneous-transform library
(zeggs_tpu/ops/xform.py — reference surface anim/xform.py + anim/mat.py)
against scipy ground truth, closed-form identities, and a direct numpy
transcription of the reference's psolve formula."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from zeggs_tpu.ops import quat, xform

RNG = np.random.default_rng(7)


def random_rots(shape):
    return R.random(int(np.prod(shape)), random_state=42).as_matrix().astype(
        np.float32).reshape(shape + (3, 3))


def test_mul_mul_vec():
    a = RNG.normal(size=(5, 3, 3)).astype(np.float32)
    b = RNG.normal(size=(5, 3, 3)).astype(np.float32)
    v = RNG.normal(size=(5, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(xform.mul(a, b)), a @ b, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(xform.mul_vec(a, v)), (a @ v[..., None])[..., 0], atol=1e-5)


def _psolve_ref(x, y, eps):
    # direct transcription of anim/mat.py:13-19 (single matrix, numpy)
    if x.shape[0] < x.shape[1]:
        return np.linalg.solve(x.T.dot(x) + (eps * eps) * np.eye(x.shape[1]),
                               x.T.dot(y)).T
    elif x.shape[0] > x.shape[1]:
        return x.T.dot(np.linalg.solve(x.dot(x.T) + (eps * eps) * np.eye(x.shape[0]),
                                       y)).T
    return np.linalg.solve(x + (eps * eps) * np.eye(x.shape[0]), y).T


@pytest.mark.parametrize("m,n", [(3, 5), (5, 3), (4, 4)])
def test_psolve_matches_reference_formula_batched(m, n):
    # non-square x makes the Gram matrix rank-deficient, so the eps**2
    # regularizer must dominate fp32 round-off for a meaningful comparison:
    # use a well-conditioned eps (the formula is identical at any eps)
    eps = 0.5
    xs = RNG.normal(size=(6, m, n)).astype(np.float32)
    ys = RNG.normal(size=(6, m, 2)).astype(np.float32)
    ours = np.asarray(xform.psolve(xs, ys, eps=eps))
    for i in range(6):
        np.testing.assert_allclose(ours[i], _psolve_ref(xs[i], ys[i], eps),
                                   rtol=1e-3, atol=1e-4)


def test_rotation_translation_round_trip():
    rot = random_rots((8,))
    pos = RNG.normal(size=(8, 3)).astype(np.float32)
    h = np.asarray(xform.from_rotation_translation(rot, pos))
    assert h.shape == (8, 4, 4)
    np.testing.assert_allclose(h[:, 3], np.tile([0, 0, 0, 1], (8, 1)), atol=0)
    r2, p2 = xform.to_rotation_translation(h)
    np.testing.assert_allclose(np.asarray(r2), rot, atol=0)
    np.testing.assert_allclose(np.asarray(p2), pos, atol=1e-6)


def test_from_angle_axis_matches_scipy():
    angle = RNG.uniform(0.1, 3.0, size=(16,)).astype(np.float32)
    axis = RNG.normal(size=(16, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ours = np.asarray(xform.from_angle_axis(angle, axis))
    ref = R.from_rotvec(angle[:, None] * axis).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_to_angle_axis_round_trip():
    # the reference clips the trace-cosine to [0, 1] (anim/xform.py:30), so
    # recoverable angles live in [0, pi/2] — round-trip within that range
    angle = RNG.uniform(0.1, 1.5, size=(16,)).astype(np.float32)
    axis = RNG.normal(size=(16, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    m = xform.from_angle_axis(angle, axis)
    a2, ax2 = xform.to_angle_axis(m)
    np.testing.assert_allclose(np.asarray(a2), angle, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ax2), axis, atol=1e-3)


def test_to_angle_axis_clamps_like_reference():
    # reference parity quirk: angles beyond pi/2 clamp to pi/2 because the
    # cosine is clipped to [0, 1], not [-1, 1] (anim/xform.py:30)
    axis = np.asarray([[0.0, 0.0, 1.0]], np.float32)
    m = xform.from_angle_axis(np.asarray([2.5], np.float32), axis)
    a2, _ = xform.to_angle_axis(m)
    np.testing.assert_allclose(np.asarray(a2), [np.pi / 2], atol=1e-6)


def test_log_exp_round_trip():
    # log goes through to_angle_axis, so the same [0, pi/2] clamp applies:
    # round-trip on rotations inside the recoverable range
    angle = RNG.uniform(0.05, 1.4, size=(12,)).astype(np.float32)
    axis = RNG.normal(size=(12, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    m = np.asarray(xform.from_angle_axis(angle, axis))
    np.testing.assert_allclose(np.asarray(xform.exp(xform.log(m))), m, atol=1e-4)


@pytest.mark.parametrize("order", ["xzy", "xyz", "yxz", "yzx", "zyx", "zxy"])
def test_from_euler_matches_quat_core(order):
    # ops/quat.from_euler is itself scipy-verified in test_quat.py; the
    # matrix construction must agree with quat -> matrix for every order
    e = RNG.uniform(-np.pi, np.pi, size=(10, 3)).astype(np.float32)
    ours = np.asarray(xform.from_euler(e, order=order))
    via_quat = np.asarray(quat.to_xform(quat.from_euler(e, order=order)))
    np.testing.assert_allclose(ours, via_quat, atol=1e-5)


def test_from_basis_columns():
    x, y, z = np.eye(3, dtype=np.float32)
    m = np.asarray(xform.from_basis(np.tile(x, (4, 1)), np.tile(y, (4, 1)),
                                    np.tile(z, (4, 1))))
    np.testing.assert_allclose(m, np.tile(np.eye(3), (4, 1, 1)), atol=0)


def _assert_rotation(m, atol):
    eye = np.matmul(m, np.swapaxes(m, -1, -2))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), m.shape), atol=atol)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=atol)


@pytest.mark.parametrize("method", ["cross", "svd"])
def test_orthogonalize_projects_to_so3(method):
    clean = random_rots((10,))
    noisy = (clean + 0.05 * RNG.normal(size=clean.shape)).astype(np.float32)
    out = np.asarray(xform.orthogonalize(noisy, method=method, eps=1e-10))
    _assert_rotation(out, atol=1e-5)
    # stays close to the rotation the noise came from
    assert np.abs(out - clean).max() < 0.2


def test_orthogonalize_svd_handles_reflection():
    # a noisy matrix with negative determinant must still project to det +1
    m = random_rots((4,))
    m[..., :, 0] *= -1.0
    out = np.asarray(xform.orthogonalize(m, method="svd"))
    _assert_rotation(out, atol=1e-5)


def _rodrigues_np(angle, axis):
    # pure-numpy Rodrigues rotation matrix (anim/xform.py:46-55), kept
    # independent of xform.from_angle_axis so the iterative parity check
    # below does not test the module against itself
    a = angle[..., None, None]
    c, s, t = np.cos(a), np.sin(a), 1.0 - np.cos(a)
    a0 = axis[..., 0, None, None]
    a1 = axis[..., 1, None, None]
    a2 = axis[..., 2, None, None]
    row = lambda *cols: np.concatenate(cols, axis=-1)
    return np.concatenate([
        row(c + a0 * a0 * t, a0 * a1 * t - a2 * s, a0 * a2 * t + a1 * s),
        row(a0 * a1 * t + a2 * s, c + a1 * a1 * t, a1 * a2 * t - a0 * s),
        row(a0 * a2 * t - a1 * s, a1 * a2 * t + a0 * s, c + a2 * a2 * t),
    ], axis=-2)


def _iterative_ref(ts, iterations, eps=1e-5):
    # direct numpy transcription of anim/xform.py:133-153 (fp64 accumulate)
    ts = ts.astype(np.float64)
    Rm = np.broadcast_to(np.eye(3, dtype=ts.dtype), ts.shape).copy()
    for _ in range(iterations):
        omega = (
            np.cross(Rm[..., :, 0], ts[..., :, 0])
            + np.cross(Rm[..., :, 1], ts[..., :, 1])
            + np.cross(Rm[..., :, 2], ts[..., :, 2])
        ) / (np.abs(
            np.sum(Rm[..., :, 0] * ts[..., :, 0], -1)[..., None]
            + np.sum(Rm[..., :, 1] * ts[..., :, 1], -1)[..., None]
            + np.sum(Rm[..., :, 2] * ts[..., :, 2], -1)[..., None]) + eps)
        w = np.sqrt(np.sum(omega ** 2, -1))
        Rm = np.matmul(_rodrigues_np(w, omega / (w[..., None] + eps)), Rm)
    return Rm


@pytest.mark.tpu
def test_orthogonalize_iterative_tpu_matches_numpy_reference():
    """On the real chip, TPU matmuls default to bf16 passes (~3e-3 rel err);
    the module pins fp32 matmul precision (ADVICE r3 medium). Parity is
    asserted in the algorithm's contractive basin — targets within ~1.2 rad
    of the identity init — where fp32 vs fp64 agree to ~3e-7. (Outside that
    basin the reference iteration is genuinely chaotic: when the target is
    near 180 deg from R, align -> 0 blows up omega and fp32-vs-fp64 round-off
    alone diverges up to ~1.4 absolute, measured on CPU — so far-from-init
    inputs cannot certify backend precision.) A removed precision pin shows
    up as ~3e-3 bf16 noise >> the 1e-5 tolerance here."""
    import jax

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    ax = rng.normal(size=(64, 3))
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    ang = rng.uniform(0.0, 1.2, 64)
    clean = R.from_rotvec(ang[:, None] * ax).as_matrix().astype(np.float32)
    noisy = (clean + 0.05 * rng.normal(size=clean.shape)).astype(np.float32)
    for iters in (4, 8):
        it = np.asarray(jax.jit(
            lambda t: xform.orthogonalize_iterative(t, iterations=iters))(noisy))
        ref = _iterative_ref(noisy, iterations=iters)
        np.testing.assert_allclose(it, ref, atol=1e-5)


@pytest.mark.tpu
def test_psolve_tpu_matches_numpy_reference():
    """psolve's Gram matmuls pin fp32 precision so the eps**2 regularizer
    is not swamped by bf16 matmul noise on TPU (ADVICE r3 low)."""
    import jax

    assert jax.default_backend() == "tpu"
    eps = 0.5
    for m, n in [(3, 5), (5, 3), (4, 4)]:
        xs = RNG.normal(size=(6, m, n)).astype(np.float32)
        ys = RNG.normal(size=(6, m, 2)).astype(np.float32)
        ours = np.asarray(jax.jit(lambda x, y: xform.psolve(x, y, eps=eps))(xs, ys))
        for i in range(6):
            np.testing.assert_allclose(ours[i], _psolve_ref(xs[i], ys[i], eps),
                                       rtol=1e-3, atol=1e-4)


def test_orthogonalize_iterative_matches_reference_and_converges():
    clean = random_rots((6,))
    noisy = (clean + 0.02 * RNG.normal(size=clean.shape)).astype(np.float32)
    it = np.asarray(xform.orthogonalize_iterative(noisy, iterations=8))
    ref = _iterative_ref(noisy, iterations=8)
    np.testing.assert_allclose(it, ref, atol=1e-4)
    _assert_rotation(it, atol=1e-3)
    # lands near the true polar projection of the noisy input
    sv = np.asarray(xform.orthogonalize(noisy, method="svd"))
    assert np.abs(it - sv).max() < 0.05
