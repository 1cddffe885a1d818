"""Pin the tunnel's fixed completion overhead vs program duration (r5, item 6).

Two experiments on the real chip:

1. **block_until_ready is not a completion wait here.** A 512-iteration
   1024^3-matmul loop (>= 5 ms of MXU work) "blocks" in 0.03 ms with
   varying inputs, while fetching one element of the same program's output
   takes 30+ ms. Large (256 MB) outputs do block ~honestly. All zeggs_tpu
   latency probes therefore time VALUE FETCHES (`scripts/dispatch_probe.py`).

2. **Linear fit: fetch_ms(n) = a*n + b** over n chained 1024^3 matmuls
   (scalar output, varying scalar input so nothing can memoize). Measured
   round 5 on the v5e chip:

       n=32: 31.7   n=128: 32.2   n=512: 33.6   n=2048: 53.4  (p50 ms)
       => a = 11.1 us/matmul  (2.15 GFLOP / 11.1 us = 194 TFLOPS,
          i.e. the MXU at bf16 peak — the device-side measurement is sane)
       => b = 30.2 ms fixed   (the tunnel's completion/observation RTT,
          independent of program size or I/O shape)

Run ON THE TPU:  python scripts/dispatch_duration_sweep.py
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


@partial(jax.jit, static_argnames=("n",))
def chain(x, s, n):
    y = jax.lax.fori_loop(0, n, lambda _, y: (y @ y) * 1e-3 + y * s, x)
    return y.sum()


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(1024, 1024)).astype(np.float32) * 1e-3))
    scales = [jax.device_put(jnp.float32(1.0 + i * 1e-6)) for i in range(40)]
    rows, si = [], 0
    for n in (32, 128, 512, 2048):
        float(chain(x, scales[si], n)); si += 1  # compile + first fetch
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(chain(x, scales[si], n))
            ts.append((time.perf_counter() - t0) * 1e3)
            si += 1
        rows.append({"n_matmuls": n,
                     "fetch_p50_ms": round(float(np.percentile(ts, 50)), 2)})
        print(json.dumps(rows[-1]), flush=True)
    ns = np.array([r["n_matmuls"] for r in rows], float)
    ms = np.array([r["fetch_p50_ms"] for r in rows], float)
    a, b = np.linalg.lstsq(np.vstack([ns, np.ones_like(ns)]).T, ms, rcond=None)[0]
    print(json.dumps({
        "platform": jax.devices()[0].platform, "sweep": rows,
        "per_matmul_us": round(a * 1e3, 1),
        "mxu_tflops": round(2 * 1024**3 / (a * 1e-3) / 1e12, 1) if a > 0 else None,
        "fixed_completion_rtt_ms": round(b, 1)}))


if __name__ == "__main__":
    main()
