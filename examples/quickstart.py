"""ZEGGS-TPU quickstart: corpus -> pipeline -> train -> generate, miniature.

Builds a tiny synthetic mocap+speech corpus, prepares it with the data
pipeline, trains for a handful of iterations, and synthesizes a gesture
clip — the complete workflow in one file.

    python examples/quickstart.py [workdir]

(On a machine without a TPU it runs on CPU in ~5 minutes.)
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import jax

# honor JAX_PLATFORMS=cpu even when an accelerator plugin's sitecustomize
# force-overrides it (remote-compile tunnels make the tiny demo slower
# than just running on host)
if os.environ.get("JAX_PLATFORMS", "") == "cpu" and jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

if jax.default_backend() != "cpu":
    # route repeat compiles through the persistent cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")

from synthetic import small_options, write_raw_corpus

from zeggs_tpu import config as C
from zeggs_tpu.cli.generate import main as generate_main
from zeggs_tpu.cli.pipeline import main as pipeline_main
from zeggs_tpu.cli.train import main as train_main
from zeggs_tpu.io import bvh


def main():
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/zeggs_quickstart")
    root.mkdir(parents=True, exist_ok=True)

    print("== 1. synthesize a raw corpus (3 clips of mocap + speech)")
    write_raw_corpus(root, n_clips=3, seconds=4.0)
    (root / "pipeline_conf.json").write_text(
        json.dumps(
            {
                "base_path": str(root),
                "processed_data_path": "processed",
                "info_filename": "info.csv",
                "audio_conf": {"normalize_loudness": False},
                "len_ratios": [1.0],
                "save_trimmed_audio": False,
                "save_trimmed_animation": False,
            }
        )
    )

    print("== 2. run the data pipeline")
    pipeline_main(["-c", str(root / "pipeline_conf.json"), "--workers", "1"])

    print("== 3. train for 30 iterations")
    opts = small_options().to_options_dict()
    opts["paths"] = {
        "base_path": str(root), "path_processed_data": "processed",
        "output_dir": None, "models_dir": None,
    }
    opts["train_opt"].update(batchsize=4, generate_samples_step=1000, use_tensorboard=False)
    (root / "options.json").write_text(json.dumps(opts, indent=2))
    train_main(["-o", str(root / "options.json"), "-n", "quickstart", "--max-iterations", "30"])

    print("== 4. generate a gesture for clip 1's speech in clip 0's style")
    run_options = root / "outputs" / "quickstart" / "options.json"
    generate_main(
        [
            "-o", str(run_options),
            "-s", str(root / "original" / "000_Synth_0.bvh"),
            "-a", str(root / "original" / "001_Synth_1.wav"),
            "-n", "quickstart_demo",
            "-r", "42",
        ]
    )

    out = root / "outputs" / "quickstart" / "results" / "quickstart_demo.bvh"
    anim = bvh.load(out)
    print(f"== generated: {out} ({anim['rotations'].shape[0]} frames, "
          f"{len(anim['names'])} joints)")

    print("== 5. serve the same model over HTTP (dynamic micro-batching)")
    import urllib.request

    from zeggs_tpu.config import Options
    from zeggs_tpu.infer import GesturePipeline
    from zeggs_tpu.serve import GestureServer

    run_opts = json.loads(run_options.read_text())
    pipe = GesturePipeline(
        Path(run_opts["paths"]["models_dir"]),
        root / "processed",
        options=Options.from_options_dict(run_opts),
    )
    server = GestureServer(pipe, max_wait_ms=20)
    port = server.start()
    body = json.dumps({
        "audio_path": str(root / "original" / "001_Synth_1.wav"),
        "style_path": str(root / "original" / "000_Synth_0.bvh"),
        "seed": 42,
    }).encode()
    with urllib.request.urlopen(
        urllib.request.Request(f"http://127.0.0.1:{port}/synthesize", data=body),
        timeout=600,
    ) as r:
        resp = json.loads(r.read())
    server.stop()
    n_lines = resp["bvh"].count("\n")
    print(f"== done: HTTP response carried {n_lines}-line BVH "
          f"(batch_size={resp['batch_size']}, {resp['latency_ms']:.0f} ms)")


if __name__ == "__main__":
    main()
