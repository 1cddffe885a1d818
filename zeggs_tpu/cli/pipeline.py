"""Data pipeline CLI.

Mirrors `python data_pipeline.py` in the reference (ZEGGS/data_pipeline.py
:739-744) with explicit flags plus multi-host sharding controls.

Usage:
  python -m zeggs_tpu.cli.pipeline -c configs/data_pipeline_conf_v1.json \
      [--workers 8] [--process-index 0 --process-count 1]

Sharded multi-host runs write per-shard archives only; once every shard
exists, run `--merge-shards N` on one host to produce the final global
artifacts (stats are computed over the merged corpus, never per host).
"""

from __future__ import annotations

import argparse
import json

from ..config import PipelineConfig
from ..data.pipeline import data_pipeline, merge_shards


def main(argv=None):
    p = argparse.ArgumentParser(prog="zeggs_tpu.pipeline", description="Prepare training corpus")
    p.add_argument("-c", "--config", type=str, required=True, help="pipeline conf JSON")
    p.add_argument("--workers", type=int, default=None, help="process-pool size for clip map")
    p.add_argument("--process-index", type=int, default=0, help="this host's shard index")
    p.add_argument("--process-count", type=int, default=1, help="total host shards")
    p.add_argument("--merge-shards", type=int, default=None, metavar="N",
                   help="merge N existing shard archives into the final artifacts")
    args = p.parse_args(argv)

    conf = PipelineConfig.from_json(args.config)
    if args.merge_shards:
        processed, definition = merge_shards(conf, args.merge_shards)
    else:
        processed, definition = data_pipeline(
            conf,
            num_workers=args.workers,
            process_index=args.process_index,
            process_count=args.process_count,
        )
    if processed is None:
        print(json.dumps({"shard": args.process_index, "of": args.process_count}))
        return
    n = len(processed["X_audio_features"])
    print(json.dumps({"frames": int(n), "labels": definition["label_names"]}))


if __name__ == "__main__":
    main()
