"""Host-side utilities: BVH writing with root baking, misc helpers."""

from __future__ import annotations

import numpy as np

from ..io import bvh
from ..ops import quat


def _np(fn, *args, **kw):
    return np.asarray(fn(*args, **kw))


_TO_EULER_JIT: dict = {}


def _to_euler_deg(q, order):
    """Jitted quat->Euler-degrees (eager dispatch costs ~165 ms for a
    600x75 clip; compiled it is ~ms). One jitted fn cached per order."""
    import jax

    if order not in _TO_EULER_JIT:
        _TO_EULER_JIT[order] = jax.jit(
            lambda x, _o=order: jax.numpy.degrees(quat.to_euler(x, order=_o))
        )
    return np.asarray(_TO_EULER_JIT[order](q))


def write_bvh(
    filename,
    root_pos,
    root_rot,
    lpos,
    lrot,
    parents,
    names,
    order="zyx",
    dt=1.0 / 60.0,
    start_position=None,
    start_rotation=None,
):
    """Write a model-space animation to BVH (reference utils.py:47-87):
    optionally re-anchor the trajectory to (start_position, start_rotation),
    bake the root transform into joint 0, convert quats to Euler degrees.
    """
    import jax

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        return _write_bvh_host(
            filename, root_pos, root_rot, lpos, lrot, parents, names, order,
            dt, start_position, start_rotation,
        )


def _write_bvh_host(
    filename, root_pos, root_rot, lpos, lrot, parents, names, order, dt,
    start_position, start_rotation,
):
    root_pos = np.asarray(root_pos)
    root_rot = np.asarray(root_rot)
    lpos = np.asarray(lpos).copy()
    lrot = np.asarray(lrot).copy()

    if start_position is not None and start_rotation is not None:
        offset_pos = root_pos[0:1].copy()
        offset_rot = root_rot[0:1].copy()
        root_pos = _np(quat.mul_vec, quat.inv(offset_rot), root_pos - offset_pos)
        root_rot = _np(quat.mul, quat.inv(offset_rot), root_rot)
        root_pos = _np(quat.mul_vec, start_rotation[None], root_pos) + start_position[None]
        root_rot = _np(quat.mul, start_rotation[None], root_rot)

    lpos[:, 0] = _np(quat.mul_vec, root_rot, lpos[:, 0]) + root_pos
    lrot[:, 0] = _np(quat.mul, root_rot, lrot[:, 0])

    bvh.save(
        filename,
        dict(
            order=order,
            offsets=lpos[0],
            names=list(names),
            frametime=dt,
            parents=np.asarray(parents),
            positions=lpos,
            rotations=_to_euler_deg(lrot, order),
        ),
    )


def split_by_ratio(length, ratio):
    """Contiguous index ranges proportional to ``ratio``
    (reference helpers.py:26-37)."""
    assert abs(sum(ratio) - 1.0) < 1e-9
    splits = []
    end = 0.0
    prev = 0
    for r in ratio:
        end += r * length
        splits.append([prev, int(end)])
        prev = int(end)
    splits[-1][-1] = length
    return splits


def flatten_dict(dd, separator="_", prefix=""):
    """Flatten nested dicts for hparam logging (helpers.py:14-23)."""
    if not isinstance(dd, dict):
        return {prefix: dd}
    out = {}
    for kk, vv in dd.items():
        key = prefix + separator + kk if prefix else kk
        out.update(flatten_dict(vv, separator, key))
    return out


def change_bvh(filename, savename, order=None, fps=None, pace=1.0, center=False):
    """Retarget a BVH file: rotation order, frame rate / pace resampling,
    optional re-centering (reference utils.py:7-44)."""
    from scipy.interpolate import griddata

    from ..io import bvh as bvh_io

    anim = bvh_io.load(filename)
    output = dict(anim)

    if order is not None:
        output["order"] = order
        rots = _np(quat.unroll, _np(quat.from_euler, np.radians(anim["rotations"]), anim["order"]))
        output["rotations"] = np.degrees(_np(quat.to_euler, rots, order=order))

    if pace is not None or fps is not None:
        if fps is None:
            fps = 1.0 / anim["frametime"]
        positions = anim["positions"]
        rots = _np(quat.unroll, _np(quat.from_euler, np.radians(anim["rotations"]), anim["order"]))
        nframes, nbones = positions.shape[:2]
        t_orig = np.linspace(0, nframes - 1, nframes)
        t_new = np.linspace(
            0, nframes - 1, int(pace * (nframes * (fps * anim["frametime"]) - 1))
        )
        output["positions"] = griddata(
            t_orig, positions.reshape(nframes, -1), t_new, method="cubic"
        ).reshape(len(t_new), nbones, 3)
        rots = griddata(t_orig, rots.reshape(nframes, -1), t_new, method="cubic").reshape(
            len(t_new), nbones, 4
        )
        rots = _np(quat.normalize, rots)
        output["rotations"] = np.degrees(_np(quat.to_euler, rots, order=output["order"]))
        output["frametime"] = 1.0 / fps

    if center:
        lrot = _np(quat.from_euler, np.radians(output["rotations"]), output["order"])
        offset_pos = output["positions"][0:1, 0:1].copy() * np.array([1, 0, 1])
        offset_rot = lrot[0:1, 0:1].copy() * np.array([1, 0, 1, 0])
        output["positions"] = np.asarray(output["positions"]).copy()
        output["positions"][:, 0:1] = _np(
            quat.mul_vec, quat.inv(offset_rot), output["positions"][:, 0:1] - offset_pos
        )
        output["rotations"] = np.asarray(output["rotations"]).copy()
        output["rotations"][:, 0:1] = np.degrees(
            _np(quat.to_euler, _np(quat.mul, quat.inv(offset_rot), lrot[:, 0:1]), order=output["order"])
        )

    bvh_io.save(savename, output)


def host_cpu():
    """Context manager pinning eager jnp math to the host CPU backend.

    Host-side feature extraction and BVH conversion are many small eager
    ops; dispatching them to the accelerator costs a device round-trip per
    op (30 ms each through a remote tunnel). Wrap host math in this context
    so only the compiled compute path touches the TPU.

    Uses the process-LOCAL cpu device: under a multi-process
    ``jax.distributed`` cluster, ``jax.devices("cpu")[0]`` is the GLOBAL
    device list's first entry — owned by rank 0 and non-addressable from
    every other rank, where eager placement then raises and wedges the
    cluster at the next collective (caught by tests/test_multihost.py).
    """
    import jax

    return jax.default_device(jax.local_devices(backend="cpu")[0])
