"""Long-run training evidence: through the KL anneal and beyond.

The reference's KL weight schedule centers at iteration 7500
(modules.py:773-776, cap 0.2) and the LR decays x0.995 every 1000 iters
(train.py:162-164,431-432) — the 400-iteration curve from round 2 never
observed either transition. This script runs the full v1 recipe (batch 32 x
256-frame windows, RAdam, 18-term loss) for 10k iterations on the synthetic
corpus, logging total loss, the weighted KL term, the KL weight, and two
representative reconstruction terms, then asserts:

  * every logged value is finite (no divergence through the anneal),
  * the reconstruction loss at the end is materially below the start,
  * the post-anneal tail (last 1k iters) is stable (no upward blow-up
    relative to the pre-anneal floor).

Writes docs/anneal_curve.json. Run ON THE TPU, one process at a time:

    python scripts/train_anneal.py --iters 10000
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from zeggs_tpu import config as C  # noqa: E402
from zeggs_tpu.train.loop import Trainer  # noqa: E402
from zeggs_tpu.train.loss import generalized_logistic_function  # noqa: E402

LOG_KEYS = ("total_loss", "loss_kl_div", "loss_lpos", "loss_lrot")


def build_corpus(root: Path):
    """Corpus build in a CPU-pinned subprocess: the featurizer's jitted hot
    paths otherwise land on the TPU default backend and pay minutes of
    remote-compile per shape through the tunnel for pure host prep work."""
    import subprocess

    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(REPO)!r}); sys.path.insert(0, {str(REPO / 'tests')!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from synthetic import write_raw_corpus\n"
        "from zeggs_tpu import config as C\n"
        "from zeggs_tpu.data.pipeline import data_pipeline\n"
        "from pathlib import Path\n"
        f"root = Path({str(root)!r})\n"
        "write_raw_corpus(root, n_clips=6, seconds=8.0)\n"
        "conf = C.PipelineConfig(base_path=str(root), processed_data_path='processed',\n"
        "    info_filename='info.csv', audio_conf=C.MelConfig(normalize_loudness=False),\n"
        "    len_ratios=(1.0,), save_trimmed_audio=False, save_trimmed_animation=False)\n"
        "data_pipeline(conf)\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    return root / "processed"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10_000)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--root", type=str, default=None)
    args = ap.parse_args(argv)

    root = Path(args.root) if args.root else Path(tempfile.mkdtemp(prefix="zeggs_anneal_"))
    processed = build_corpus(root)

    opts = C.Options(
        net=C.NetworkConfig(),  # full v1 capacity
        train=C.TrainConfig(
            batchsize=32, window=256, seed=1234, compute_dtype=args.dtype,
            generate_samples_step=10**9, use_tensorboard=False,
        ),
    )
    curve = {k: [] for k in LOG_KEYS}
    curve["kl_weight"] = []
    iters_logged = []
    t_start = time.time()

    def on_step(i, m):
        if i % args.log_every:
            return
        iters_logged.append(i)
        for k in LOG_KEYS:
            curve[k].append(float(m[k]))
        curve["kl_weight"].append(
            min(float(generalized_logistic_function(np.float32(i), center=7500.0, growth=0.005)), 0.2)
        )
        if i % 500 == 0:
            el = time.time() - t_start
            print(f"iter {i}: total={curve['total_loss'][-1]:.4f} "
                  f"kl={curve['loss_kl_div'][-1]:.5f} w={curve['kl_weight'][-1]:.4f} "
                  f"({el:.0f}s)", flush=True)

    with tempfile.TemporaryDirectory() as td:
        trainer = Trainer(
            opts, Path(td) / "m", Path(td) / "l",
            processed / "processed_data.npz", processed / "data_definition.json",
        )
        trainer.generate_samples = lambda *a, **k: None  # curve run only
        trainer.run(max_iterations=args.iters, log_every=10**9, on_step=on_step)

    out = REPO / "docs" / "anneal_curve.json"
    out.write_text(json.dumps({
        "iters": args.iters, "log_every": args.log_every,
        "dtype": args.dtype, "kl_center": 7500, "iters_logged_len": len(iters_logged),
        **curve,
    }))
    print(f"wrote {out}")

    tot = np.asarray(curve["total_loss"])
    assert np.isfinite(np.concatenate([np.asarray(curve[k]) for k in curve])).all(), \
        "non-finite value in training curve"
    head = float(tot[:10].mean())
    pre_anneal_floor = float(tot[len(tot) // 2 - 50 : len(tot) // 2].mean())
    tail = float(tot[-100:].mean())
    print(f"loss: start {head:.3f} -> mid {pre_anneal_floor:.3f} -> tail {tail:.3f}; "
          f"kl weight final {curve['kl_weight'][-1]:.3f}")
    assert tail < 0.6 * head, "loss did not decrease materially over the run"
    assert tail < 2.0 * pre_anneal_floor + 0.25, \
        "post-anneal loss blew up relative to the pre-anneal floor"
    print("full schedule stable through the KL anneal. OK")


if __name__ == "__main__":
    main()
