"""FK tests against an independent recursive NumPy/scipy implementation."""

import numpy as np
from scipy.spatial.transform import Rotation as R

from zeggs_tpu.ops import fk, quat, xform

RNG = np.random.default_rng(1)

# small random tree: parents[i] < i
PARENTS = [-1, 0, 1, 1, 0, 4, 5, 5, 0, 8]
J = len(PARENTS)


def random_quats(shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def scipy_rot(q):
    return R.from_quat(np.concatenate([q[1:], q[:1]]))


def brute_fk(lrot, lpos, parents):
    """Independent reference: global = parent_global ∘ local."""
    B = lrot.shape[0]
    gr = np.zeros_like(lrot)
    gp = np.zeros_like(lpos)
    for b in range(B):
        rots = [scipy_rot(lrot[b, 0])]
        gp[b, 0] = lpos[b, 0]
        gr[b, 0] = lrot[b, 0]
        for i in range(1, len(parents)):
            p = parents[i]
            rp = rots[p]
            gp[b, i] = rp.apply(lpos[b, i]) + gp[b, p]
            rg = rp * scipy_rot(lrot[b, i])
            rots.append(rg)
            qx = rg.as_quat()
            gr[b, i] = np.concatenate([qx[3:], qx[:3]])
    return gr, gp


def test_fk_matches_bruteforce():
    lrot = random_quats((4, J))
    lpos = RNG.normal(size=(4, J, 3)).astype(np.float32)
    gr, gp = fk.fk(lrot, lpos, PARENTS)
    gr_ref, gp_ref = brute_fk(lrot, lpos, PARENTS)
    np.testing.assert_allclose(np.asarray(gp), gp_ref, atol=1e-4)
    dot = np.abs(np.sum(np.asarray(gr) * gr_ref, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_ik_rot_inverts_fk():
    lrot = random_quats((3, J))
    lpos = RNG.normal(size=(3, J, 3)).astype(np.float32)
    gr, _ = fk.fk(lrot, lpos, PARENTS)
    lr2 = np.asarray(fk.ik_rot(np.asarray(gr), PARENTS))
    dot = np.abs(np.sum(lr2 * lrot, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_fk_vel_positions_match_fk():
    lrot = random_quats((2, J))
    lpos = RNG.normal(size=(2, J, 3)).astype(np.float32)
    lvrt = RNG.normal(size=(2, J, 3)).astype(np.float32)
    lvel = RNG.normal(size=(2, J, 3)).astype(np.float32)
    gr1, gp1 = fk.fk(lrot, lpos, PARENTS)
    gr2, gp2, gt, gv = fk.fk_vel(lrot, lpos, lvrt, lvel, PARENTS)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr1), np.asarray(gr2), atol=1e-6)


def test_fk_vel_finite_difference():
    """Velocities propagated by fk_vel match finite differences of fk
    positions under small time steps."""
    dt = 1e-4
    lrot0 = random_quats((1, J))
    lvrt = RNG.normal(size=(1, J, 3)).astype(np.float32)
    lvel = RNG.normal(size=(1, J, 3)).astype(np.float32)
    lpos0 = RNG.normal(size=(1, J, 3)).astype(np.float32)
    # integrate local state forward by dt: x += v dt; q = exp(w dt/2) * q
    lpos1 = lpos0 + lvel * dt
    dq = np.asarray(quat.from_helical(lvrt * dt))
    lrot1 = np.asarray(quat.mul(dq, lrot0))

    _, gp0, _, gv = fk.fk_vel(lrot0, lpos0, lvrt, lvel, PARENTS)
    _, gp1 = fk.fk(lrot1, lpos1, PARENTS)
    fd = (np.asarray(gp1) - np.asarray(gp0)) / dt
    np.testing.assert_allclose(np.asarray(gv), fd, atol=5e-2, rtol=5e-2)


def test_xform_fk_vel_matches_quat_fk_vel():
    lrot = random_quats((2, 7, J))  # batch x time x joints
    lpos = RNG.normal(size=(2, 7, J, 3)).astype(np.float32)
    lvrt = RNG.normal(size=(2, 7, J, 3)).astype(np.float32)
    lvel = RNG.normal(size=(2, 7, J, 3)).astype(np.float32)
    gr_q, gp_q, gt_q, gv_q = fk.fk_vel(lrot, lpos, lvrt, lvel, PARENTS)
    lmat = quat.to_xform(lrot)
    gr_m, gp_m, gt_m, gv_m = fk.xform_fk_vel(lmat, lpos, lvrt, lvel, PARENTS)
    np.testing.assert_allclose(np.asarray(gp_m), np.asarray(gp_q), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt_m), np.asarray(gt_q), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv_m), np.asarray(gv_q), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gr_m), np.asarray(quat.to_xform(gr_q)), atol=1e-4
    )


def test_orthogonalize_from_xy():
    q = random_quats((11,))
    xy_rows = np.asarray(quat.to_xy(q))  # (..., 3, 2) columns repr
    # orthogonalize expects (..., 2, 3): rows = x-axis image, y-axis image
    m = np.asarray(xform.orthogonalize_from_xy(np.swapaxes(xy_rows, -1, -2)))
    np.testing.assert_allclose(m, np.asarray(quat.to_xform(q)), atol=1e-4)
