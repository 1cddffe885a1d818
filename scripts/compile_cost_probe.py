"""Where do the train-bench "compile" minutes go on a persistent-cache HIT?

BENCH_r04 measured compile_s=167.7 (fp32) / 299.2 (bf16) with the cache
probe reporting a HIT (VERDICT r4 item 2). This script splits the cost into
its actual phases on the real device:

  backend_init_s   first jax.devices() touch (tunnel/client setup)
  trivial_rtt_ms   round-trip of a trivial jit add (dispatch floor)
  build_s          build_step(): corpus upload + init_networks + device_put
  lower_s          step.lower(...): TRACING + StableHLO emission (host CPU)
  compile_s        lowered.compile(): cache lookup/deserialize OR XLA
                   compile, PLUS loading the executable onto the device
                   through the tunnel
  first_exec_s     first real step (device warmup)

Run ON THE TPU, one process at a time:
    python scripts/compile_cost_probe.py [--bf16]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

t0 = time.perf_counter()
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    out = {}
    dev = jax.devices()[0]
    out["platform"] = dev.platform
    out["backend_init_s"] = round(time.perf_counter() - t0, 2)

    # trivial dispatch round-trip (floor for any blocked call)
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a + 1.0)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(10):
        t1 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t1)
    out["trivial_rtt_ms"] = round(float(np.median(ts)) * 1e3, 1)

    from device_train_bench import _CacheProbe, build_step

    dtype = "bfloat16" if "--bf16" in sys.argv else "float32"
    probe = _CacheProbe()
    t1 = time.perf_counter()
    b = build_step(dtype)
    out["build_s"] = round(time.perf_counter() - t1, 1)

    step, corpus, ds, put_idx = b["step"], b["corpus"], b["ds"], b["put_idx"]
    params_s, opt_s, key = b["params_s"], b["opt_s"], b["key"]
    rng = np.random.default_rng(0)
    idx0 = rng.integers(0, len(ds.window_starts), size=b["batchsize"])
    args0 = put_idx(*corpus.sample_indices(idx0, 2 * rng.integers(128, 257)))

    t1 = time.perf_counter()
    lowered = step.lower(params_s, opt_s, *args0, jnp.float32(0.0), key)
    out["lower_s"] = round(time.perf_counter() - t1, 1)

    t1 = time.perf_counter()
    compiled = lowered.compile()
    out["compile_s"] = round(time.perf_counter() - t1, 1)
    out["cache"] = "hit" if probe.was_hit() else "miss"

    t1 = time.perf_counter()
    params_s, opt_s, m = compiled(params_s, opt_s, *args0, jnp.float32(0.0), key)
    jax.block_until_ready(m["total_loss"])
    out["first_exec_s"] = round(time.perf_counter() - t1, 1)

    # steady state
    ts = []
    for i in range(5):
        t1 = time.perf_counter()
        params_s, opt_s, m = compiled(params_s, opt_s, *args0,
                                      jnp.float32(i + 1.0), key)
        jax.block_until_ready(m["total_loss"])
        ts.append(time.perf_counter() - t1)
    out["step_ms"] = round(float(np.min(ts)) * 1e3, 1)
    out["total_to_steady_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
