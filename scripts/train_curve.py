"""Training-recipe evidence: a few-hundred-iteration synthetic run.

Shows the full recipe (18-term loss + KL annealing + RAdam + ExpLR
schedule, v1 network capacity) actually LEARNS — total loss decreases
materially — and that bf16 compute tracks fp32 (VERDICT r1, item 8).

Writes docs/loss_curve.json {iters, fp32: [...], bf16: [...]} and prints a
summary. Run on the TPU (one process at a time):

    python scripts/train_curve.py --iters 400
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests.synthetic import write_raw_corpus  # noqa: E402
from zeggs_tpu import config as C  # noqa: E402
from zeggs_tpu.data.pipeline import data_pipeline  # noqa: E402
from zeggs_tpu.train.loop import Trainer  # noqa: E402


def build_corpus(root: Path):
    write_raw_corpus(root, n_clips=6, seconds=8.0)
    conf = C.PipelineConfig(
        base_path=str(root), processed_data_path="processed",
        info_filename="info.csv",
        audio_conf=C.MelConfig(normalize_loudness=False), len_ratios=(1.0,),
        save_trimmed_audio=False, save_trimmed_animation=False,
    )
    data_pipeline(conf)
    return root / "processed"


def run(processed, dtype, iters, seed=1234):
    opts = C.Options(
        net=C.NetworkConfig(),  # full v1 capacity (GRU 2x1024, attn style enc)
        train=C.TrainConfig(
            batchsize=32, window=256, seed=seed, compute_dtype=dtype,
            generate_samples_step=10**9, use_tensorboard=False,
        ),
    )
    losses = []
    with tempfile.TemporaryDirectory() as td:
        t = Trainer(
            opts, Path(td) / "m", Path(td) / "l",
            processed / "processed_data.npz", processed / "data_definition.json",
        )
        t.run(max_iterations=iters,
              on_step=lambda i, m: losses.append(float(m["total_loss"])))
    return losses


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--root", type=str, default=None)
    args = ap.parse_args(argv)

    root = Path(args.root) if args.root else Path(tempfile.mkdtemp(prefix="zeggs_curve_"))
    processed = build_corpus(root)

    curves = {}
    for dtype in ("float32", "bfloat16"):
        curves[dtype] = run(processed, dtype, args.iters)
        head = float(np.mean(curves[dtype][:10]))
        tail = float(np.mean(curves[dtype][-50:]))
        print(f"{dtype}: loss {head:.3f} -> {tail:.3f} "
              f"({tail / head:.2%} of start) over {args.iters} iters")

    out = REPO / "docs" / "loss_curve.json"
    out.write_text(json.dumps({"iters": args.iters, **curves}))
    print(f"wrote {out}")

    f32_tail = float(np.mean(curves["float32"][-50:]))
    bf_tail = float(np.mean(curves["bfloat16"][-50:]))
    head = float(np.mean(curves["float32"][:10]))
    assert f32_tail < 0.5 * head, "fp32 loss did not decrease materially"
    assert abs(bf_tail - f32_tail) / f32_tail < 0.15, "bf16 diverges from fp32"
    print("recipe learns; bf16 tracks fp32. OK")


if __name__ == "__main__":
    main()
