"""Break the training forward pass into pieces and time each on TPU."""

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
from zeggs_tpu.ops import fk, quat
from zeggs_tpu.train import loss as L
from zeggs_tpu.models import decoder
from zeggs_tpu.train.loop import init_networks

B, T, J = 32, 256, 75
rng = np.random.default_rng(0)
q = rng.normal(size=(B, T, 4)).astype(np.float32)
q /= np.linalg.norm(q, axis=-1, keepdims=True)
W = {
    "root_pos": jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32)),
    "root_rot": jnp.asarray(q),
    "root_vel": jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32)),
    "root_vrt": jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32)),
    "lpos": jnp.asarray(rng.normal(size=(B, T, J, 3)).astype(np.float32)),
    "ltxy": jnp.asarray(rng.normal(size=(B, T, J, 2, 3)).astype(np.float32)),
    "lvel": jnp.asarray(rng.normal(size=(B, T, J, 3)).astype(np.float32)),
    "lvrt": jnp.asarray(rng.normal(size=(B, T, J, 3)).astype(np.float32)),
}
parents = [-1] + list(range(J - 1))
gaze = jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32))


def timed(name, f, *args):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {float(np.median(ts))*1000:.1f} ms", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("loss", "all"):
    f_loss = jax.jit(lambda O, Wt: L.compute_loss(O, Wt, gaze, parents, 1 / 60)[0])
    timed("full compute_loss fwd", f_loss, W, W)

if which in ("fk", "all"):
    lmat = quat.to_xform(quat.normalize(q))[:, :, None].repeat(J, 2)

    f_fk = jax.jit(
        lambda m, p, w, v: fk.xform_fk_vel(m, p, w, v, parents)[1].sum()
    )
    timed("xform_fk_vel fwd", f_fk, lmat, W["lpos"], W["lvrt"], W["lvel"])

if which in ("rollout", "all"):
    opts = C.Options()
    dims = dict(num_audio_features=81, pose_input_size=g.POSE_IN, pose_output_size=g.POSE_OUT)
    params = init_networks(jax.random.PRNGKey(0), opts, dims, nlabels=19)
    speech = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
    stats = {k: jnp.asarray(v) for k, v in g._stats().items()}
    s0 = tuple(W[k][:, 0] for k in ("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"))

    f_roll = jax.jit(
        lambda s0_, gz, sp, st: decoder.rollout(
            params["decoder"], *s0_, gz, sp, st,
            stats["anim_input_mean"], stats["anim_input_std"],
            stats["anim_output_mean"], stats["anim_output_std"], 1 / 60.0,
        )[0].sum()
    )
    timed("decoder rollout fwd fp32", f_roll, s0, gaze, speech, style)

print("LOSSPROFILE_DONE")
