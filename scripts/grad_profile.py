"""Time gradients of each training sub-graph separately."""

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
from zeggs_tpu.train import loss as L
from zeggs_tpu.models import decoder, style_encoder
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
stats = {k: jnp.asarray(v) for k, v in g._stats().items()}
opts = C.Options()
dims = dict(num_audio_features=81, pose_input_size=g.POSE_IN, pose_output_size=g.POSE_OUT)
params = init_networks(jax.random.PRNGKey(0), opts, dims, nlabels=19)
speech = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
style = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32))
s0 = tuple(W[k][:, 0] for k in ("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"))


def timed(name, f, *args):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {float(np.median(ts))*1000:.1f} ms", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("rollgrad", "all"):
    def roll_l2(p):
        out = decoder.rollout(
            p, *s0, gaze, speech, style,
            stats["anim_input_mean"], stats["anim_input_std"],
            stats["anim_output_mean"], stats["anim_output_std"], 1 / 60.0,
        )
        return sum(jnp.sum(o**2) for o in out)

    timed("grad(rollout L2) fp32", jax.jit(jax.grad(roll_l2)), params["decoder"])

if which in ("lossgrad", "all"):
    def loss_only(O):
        return L.compute_loss(O, W, gaze, parents, 1 / 60)[0]

    timed("grad(compute_loss wrt outputs)", jax.jit(jax.grad(loss_only)), dict(W))

if which in ("stylegrad", "all"):
    ex = jnp.asarray(rng.normal(size=(B, 512, g.POSE_IN)).astype(np.float32))
    lens = jnp.full((B,), 256, jnp.int32)

    def style_l2(p):
        emb, mu, lv = style_encoder.apply(
            p, ex, lengths=lens, encoder_type="attn", use_vae=True,
            style_embedding_size=64, train=False,
        )
        return jnp.sum(emb**2)

    timed("grad(style encoder)", jax.jit(jax.grad(style_l2)), params["style_encoder"])

print("GRADPROFILE_DONE")
