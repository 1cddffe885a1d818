"""BVH comparison tool: pose-error metrics between two animations.

Supports the parity workflow ("pose MAE < 1e-3 vs the reference",
BASELINE.json): compare a generated BVH against a reference BVH and print
per-channel and joint-position error statistics.

Usage:
  python -m zeggs_tpu.cli.compare ref.bvh test.bvh [--json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..io import bvh
from ..ops import fk, quat


def compare_bvh(ref_path, test_path):
    a = bvh.load(ref_path)
    b = bvh.load(test_path)
    if a["rotations"].shape != b["rotations"].shape:
        return {
            "comparable": False,
            "ref_frames": int(a["rotations"].shape[0]),
            "test_frames": int(b["rotations"].shape[0]),
        }
    rot_mae = float(np.abs(a["rotations"] - b["rotations"]).mean())
    pos_mae = float(np.abs(a["positions"] - b["positions"]).mean())

    # joint-position error through FK (order-independent measure)
    qa = quat.from_euler(np.radians(a["rotations"]), a["order"])
    qb = quat.from_euler(np.radians(b["rotations"]), b["order"])
    _, gpa = fk.fk(qa, a["positions"], a["parents"])
    _, gpb = fk.fk(qb, b["positions"], b["parents"])
    jpe = np.linalg.norm(np.asarray(gpa) - np.asarray(gpb), axis=-1)
    return {
        "comparable": True,
        "frames": int(a["rotations"].shape[0]),
        "rotation_mae_deg": rot_mae,
        "position_mae": pos_mae,
        "joint_position_error_mean": float(jpe.mean()),
        "joint_position_error_max": float(jpe.max()),
    }


def main(argv=None):
    p = argparse.ArgumentParser(prog="zeggs_tpu.compare")
    p.add_argument("ref")
    p.add_argument("test")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)
    result = compare_bvh(args.ref, args.test)
    if args.json:
        print(json.dumps(result))
    else:
        for k, v in result.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
