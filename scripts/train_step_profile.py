"""Locate the training-step bottleneck: fwd-only vs grad, fp32 vs bf16."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as g
from zeggs_tpu import config as C
from zeggs_tpu.parallel import create_mesh
from zeggs_tpu.train.loop import init_networks, make_loss_fn, make_train_step


def batch_of(B, T):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, T, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return {
        "audio_features": rng.normal(size=(B, T, 81)).astype(np.float32),
        "root_pos": rng.normal(size=(B, T, 3)).astype(np.float32),
        "root_rot": q,
        "root_vel": rng.normal(size=(B, T, 3)).astype(np.float32) * 0.1,
        "root_vrt": rng.normal(size=(B, T, 3)).astype(np.float32) * 0.1,
        "lpos": rng.normal(size=(B, T, 75, 3)).astype(np.float32),
        "ltxy": rng.normal(size=(B, T, 75, 2, 3)).astype(np.float32),
        "lvel": rng.normal(size=(B, T, 75, 3)).astype(np.float32) * 0.1,
        "lvrt": rng.normal(size=(B, T, 75, 3)).astype(np.float32) * 0.1,
        "gaze_pos": rng.normal(size=(B, T, 3)).astype(np.float32),
        "example": rng.normal(size=(B, 512, g.POSE_IN)).astype(np.float32),
        "example_lengths": np.full(B, 256, np.int32),
    }


def timed(fn, *args, n=4):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    stats = g._stats()
    parents = [-1] + list(range(74))
    dims = dict(num_audio_features=81, pose_input_size=g.POSE_IN, pose_output_size=g.POSE_OUT)
    key = jax.random.PRNGKey(0)
    batch = batch_of(32, 256)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("fwd", "all"):
        opts = C.Options()
        params = init_networks(key, opts, dims, nlabels=19)
        loss_fn = make_loss_fn(opts, stats, parents, 1 / 60.0)
        f = jax.jit(lambda p, b: loss_fn(p, b, jnp.float32(0), jax.random.PRNGKey(0))[0])
        t = timed(f, params, batch)
        print(f"fwd-only loss (fp32): {t*1000:.0f} ms", flush=True)

    if which in ("bf16", "all"):
        opts16 = C.Options(train=C.TrainConfig(compute_dtype="bfloat16"))
        params = init_networks(key, opts16, dims, nlabels=19)
        mesh = create_mesh(1)
        tx, step = make_train_step(opts16, stats, parents, 1 / 60.0, mesh=mesh)
        opt_state = tx.init(params)
        f = lambda p, o, b: step(p, o, b, jnp.float32(0), jax.random.PRNGKey(0))[2]["total_loss"]
        # run full steps without donation reuse issues
        params2, opt2, m = step(params, opt_state, batch, jnp.float32(0), key)
        jax.block_until_ready(m["total_loss"])
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            params2, opt2, m = step(params2, opt2, batch, jnp.float32(i), key)
            jax.block_until_ready(m["total_loss"])
            ts.append(time.perf_counter() - t0)
        print(f"full step (bf16 scan): {float(np.median(ts))*1000:.0f} ms", flush=True)
    print("PROFILE_DONE")


if __name__ == "__main__":
    main()
