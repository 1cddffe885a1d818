"""Training CLI.

Mirrors the reference entry point (ZEGGS/main.py:10-75): `-o options.json
-n name`, resolves output/saved_models/logs dirs, dumps the merged
options.json, then runs the trainer.

Usage:
  python -m zeggs_tpu.cli.train -o configs/configs_v1.json -n my_run
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..config import Options, resolve_output_dirs
from ..train.loop import Trainer
from ..utils import flatten_dict
from ..utils.metrics import make_writer


def _provenance():
    """Git hash + versions for experiment reproducibility."""
    import platform
    import subprocess

    import jax

    from .. import __version__

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=Path(__file__).resolve().parents[2],
        ).stdout.strip()
    except Exception:
        rev = None
    return {
        "zeggs_tpu": __version__,
        "git": rev,
        "jax": jax.__version__,
        "python": platform.python_version(),
        "devices": [str(d) for d in jax.devices()],
    }


def main(argv=None):
    p = argparse.ArgumentParser(prog="zeggs_tpu.train", description="Train ZEGGS-TPU networks")
    p.add_argument("-o", "--options", type=str, required=True)
    p.add_argument("-n", "--name", type=str, required=False)
    p.add_argument("--max-iterations", type=int, default=None, help="override 1000*niterations")
    p.add_argument(
        "--host-batches", action="store_true",
        help="assemble batches on host instead of the device-resident corpus "
        "(for corpora larger than device HBM)",
    )
    # multi-host launch (SURVEY.md §5): every process runs this CLI with the
    # same options over a shared filesystem; see Trainer's multi-host contract
    p.add_argument("--coordinator-address", type=str, default=None,
                   help="jax.distributed coordinator, e.g. host0:1234")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    from ..parallel.distributed import initialize as distributed_initialize

    distributed_initialize(args.coordinator_address, args.num_processes, args.process_id)

    opts = Options.from_options_json(args.options)
    output_dir, models_dir, logs_dir = resolve_output_dirs(opts, args.name)

    base = Path(opts.paths.base_path)
    processed = base / opts.paths.path_processed_data
    path_processed_data = processed / "processed_data.npz"
    path_data_definition = processed / "data_definition.json"

    merged = opts.to_options_dict()
    merged["paths"]["output_dir"] = str(output_dir)
    merged["paths"]["models_dir"] = str(models_dir)
    # reproducibility stamp (replaces the reference's full code-dir snapshot,
    # helpers.py:6-11, with provenance that doesn't balloon the output dir)
    merged["provenance"] = _provenance()
    (output_dir / "options.json").write_text(json.dumps(merged, indent=4))

    writer = make_writer(logs_dir, opts.train.use_tensorboard)
    if hasattr(writer, "write_hparams"):
        writer.write_hparams(flatten_dict(merged["net_opt"]) | flatten_dict(merged["train_opt"]))

    trainer = Trainer(
        opts, models_dir, logs_dir, path_processed_data, path_data_definition,
        writer=writer, device_corpus=not args.host_batches,
    )

    def on_step(it, metrics):
        if it % 10 == 0:
            print(f"iter {it}: loss={float(metrics['total_loss']):.4f}", flush=True)

    trainer.run(max_iterations=args.max_iterations, on_step=on_step)
    trainer.save_checkpoint()
    print("Done!")


if __name__ == "__main__":
    main()
