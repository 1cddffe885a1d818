"""Decompose the B=1 serving dispatch overhead (VERDICT r4 item 6).

BENCH_r04 shows `b1_dispatch_p50_ms 47.1` for one unchained fused-B=1
rollout whose on-device time is ~29 ms. Where do the other ~20 ms live?

**Measurement caveat discovered on the way (round 5):** on the axon tunnel
platform, `jax.block_until_ready` does NOT reliably wait for device
completion of small/medium outputs — a 512-matmul program "blocks" in
0.03 ms while a value fetch of the same program takes 30+ ms
(`scripts/dispatch_duration_sweep.py` and DESIGN.md §7b). All rows here
therefore time a VALUE FETCH of a scalar/small output, which provably
observes completion. `*_issue_ms` rows time only the async call return.

Findings (see DESIGN.md §7b for the full table):
  * issue cost is ~0.02 ms for every program — argument count, input
    bytes, and output buffers are all innocent;
  * fetch-observed completion carries a FIXED ~30 ms tunnel round trip
    regardless of program duration (linear fit over 32..2048 chained
    1024^3 matmuls: 11.1 us/matmul == 194 TFLOPS == v5e bf16 peak, fixed
    intercept 30.2 ms);
  * chaining k rollouts inside one jit amortizes the round trip to ~1/k:
    per-rollout time converges to the on-device ~29.6 ms.

Run ON THE TPU, one process at a time:

    python scripts/dispatch_probe.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def _observe(out):
    """Force completion observably: fetch one element of one output."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jax.numpy.ravel(leaf)[0])


def timed(fn, args_fn, iters, warmup, observe=True):
    """args_fn(i) -> args for call i (vary inputs so no layer can memoize)."""
    for i in range(warmup):
        _observe(fn(*args_fn(i)))
    ts = []
    for i in range(iters):
        a = args_fn(warmup + i)
        t0 = time.perf_counter()
        out = fn(*a)
        if observe:
            _observe(out)
        ts.append(time.perf_counter() - t0)
    if not observe:
        _observe(out)
    ts = np.asarray(ts) * 1e3
    return {"p50_ms": round(float(np.percentile(ts, 50)), 2),
            "p90_ms": round(float(np.percentile(ts, 90)), 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    args = ap.parse_args()
    it, wu = args.iters, args.warmup
    out = {"platform": jax.devices()[0].platform,
           "timing": "value-fetch observed (see module docstring)"}

    rng = np.random.default_rng(0)
    dev = lambda a: jax.device_put(jnp.asarray(a))  # noqa: E731
    n_variants = it + wu + 1
    scales = [dev(np.float32(1.0 + i * 1e-6)) for i in range(n_variants)]

    # --- tiny program, one real multiply (not constant-foldable) ---
    x1 = dev(rng.normal(size=(128, 128)).astype(np.float32))

    @jax.jit
    def tiny(x, s):
        return (x * s).sum()

    out["tiny_1in_1out"] = timed(tiny, lambda i: (x1, scales[i]), it, wu)

    # --- many small input buffers ---
    xs = [dev(rng.normal(size=(128,)).astype(np.float32)) for _ in range(12)]

    @jax.jit
    def tiny12(s, *zs):
        return sum(z.sum() for z in zs) * s

    out["tiny_12in"] = timed(tiny12, lambda i: (scales[i], *xs), it, wu)

    # --- the rollout's real input bytes (audio/gaze/style) ---
    big_in = (dev(rng.normal(size=(1, 600, 80)).astype(np.float32)),
              dev(rng.normal(size=(1, 600, 3)).astype(np.float32)),
              dev(rng.normal(size=(1, 600, 64)).astype(np.float32)))

    @jax.jit
    def tiny_bigin(s, a, g, z):
        return (a.sum() + g.sum() + z.sum()) * s

    out["tiny_bigin"] = timed(tiny_bigin, lambda i: (scales[i], *big_in), it, wu)

    # --- the rollout's output buffer count/bytes (4 x (1,600,K)) ---
    @jax.jit
    def tiny_4bigout(a, s):
        base = a * s
        return (jnp.broadcast_to(base[..., :1], (1, 600, 225)) * 1.0,
                jnp.broadcast_to(base[..., :1], (1, 600, 300)) * 1.0,
                jnp.broadcast_to(base[..., :1], (1, 600, 3)) * 1.0,
                jnp.broadcast_to(base[..., :1], (1, 600, 4)) * 1.0)

    out["tiny_4bigout"] = timed(tiny_4bigout, lambda i: (big_in[0], scales[i]),
                                it, wu)

    # --- the production fused B=1 program ---
    from __graft_entry__ import AUDIO_DIM, NJOINTS, POSE_IN, POSE_OUT, _initial_state, _stats
    from bench import make_synthesis_fn
    from zeggs_tpu import config as C
    from zeggs_tpu.train.loop import init_networks

    opts = C.Options()
    dims = dict(num_audio_features=AUDIO_DIM, pose_input_size=POSE_IN,
                pose_output_size=POSE_OUT)
    params = init_networks(jax.random.PRNGKey(0), opts, dims, nlabels=19)
    stats = {k: jnp.asarray(v) for k, v in _stats().items()}
    T = 600
    state0 = jax.tree.map(dev, _initial_state(rng, 1, NJOINTS))
    gaze = dev(rng.normal(size=(1, T, 3)).astype(np.float32))
    style = dev(rng.normal(size=(1, T, 64)).astype(np.float32))
    audios = [dev(rng.normal(size=(1, T, AUDIO_DIM)).astype(np.float32) * 0.1)
              for _ in range(n_variants)]

    fn1 = make_synthesis_fn(params, stats, "bfloat16", fused_b1=True, chain=1)
    b1_args = lambda i: (audios[i], gaze, style, state0)  # noqa: E731
    out["b1_full_observed"] = timed(fn1, b1_args, it, wu)
    out["b1_issue_only"] = timed(fn1, b1_args, it, wu, observe=False)

    fn10 = make_synthesis_fn(params, stats, "bfloat16", fused_b1=True, chain=10)
    r = timed(fn10, b1_args, max(3, it // 5), 2)
    out["b1_chain10_per"] = {k: round(v / 10, 2) for k, v in r.items()}

    ov = out["b1_full_observed"]["p50_ms"] - out["b1_chain10_per"]["p50_ms"]
    out["completion_rtt_ms"] = round(ov, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
