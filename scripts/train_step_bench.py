"""Measure the full-size training step on the attached TPU.

B=32 x T=256 windows, 75 joints, decoder GRU 2x1024 — the reference's
training configuration (configs_v1.json). Prints step time and projected
160k-iteration wall time.
"""

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
from zeggs_tpu.train.loop import init_networks, make_train_step


def main(remat=False):
    opts = C.Options()
    if remat:
        opts = C.Options(train=C.TrainConfig(remat=True))
    mesh = create_mesh(1)
    stats = g._stats()
    parents = [-1] + list(range(74))
    dims = dict(num_audio_features=81, pose_input_size=g.POSE_IN, pose_output_size=g.POSE_OUT)
    key = jax.random.PRNGKey(0)
    params = init_networks(key, opts, dims, nlabels=19)
    tx, step = make_train_step(opts, stats, parents, 1 / 60.0, mesh=mesh)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    B, T = 32, 256
    q = rng.normal(size=(B, T, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    batch = {
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
    print("compiling full-size train step...", flush=True)
    t0 = time.time()
    params, opt_state, m = step(params, opt_state, batch, jnp.float32(0), key)
    jax.block_until_ready(m["total_loss"])
    print(f"compile+first step: {time.time() - t0:.1f}s; loss {float(m['total_loss']):.4f}", flush=True)
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        params, opt_state, m = step(params, opt_state, batch, jnp.float32(i + 1), key)
        jax.block_until_ready(m["total_loss"])
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"train step: {t * 1000:.0f} ms -> {1 / t:.1f} it/s; 160k iters = {160000 * t / 3600:.1f} h", flush=True)
    print("TRAINBENCH_DONE")


if __name__ == "__main__":
    main(remat="--remat" in sys.argv)
