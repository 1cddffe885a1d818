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

if which in ("fullgrad", "all2"):
    from zeggs_tpu.train.loop import make_loss_fn

    batch = {
        **{k: v for k, v in W.items()},
        "audio_features": jnp.asarray(rng.normal(size=(B, T, 81)).astype(np.float32)),
        "gaze_pos": gaze,
        "example": jnp.asarray(rng.normal(size=(B, 512, g.POSE_IN)).astype(np.float32)),
        "example_lengths": jnp.full((B,), 256, jnp.int32),
    }
    loss_fn = make_loss_fn(opts, {k: np.asarray(v) for k, v in stats.items()}, parents, 1 / 60.0)
    f = jax.jit(lambda p: jax.value_and_grad(
        lambda pp: loss_fn(pp, batch, jnp.float32(0), jax.random.PRNGKey(0))[0])(p)[0])
    timed("value_and_grad(full loss_fn)", f, params)

if which in ("fullgrad_nodrop", "all2"):
    from zeggs_tpu.train import loop as tl

    batch = {
        **{k: v for k, v in W.items()},
        "audio_features": jnp.asarray(rng.normal(size=(B, T, 81)).astype(np.float32)),
        "gaze_pos": gaze,
        "example": jnp.asarray(rng.normal(size=(B, 512, g.POSE_IN)).astype(np.float32)),
        "example_lengths": jnp.full((B,), 256, jnp.int32),
    }
    # loss fn with dropout disabled (train=False through the encoders)
    from zeggs_tpu.models import speech_encoder as se_mod
    from zeggs_tpu.train.loss import compute_loss as cl

    def loss_nodrop(p):
        audio = (batch["audio_features"] - stats["audio_input_mean"]) / stats["audio_input_std"]
        sp = se_mod.apply(p["speech_encoder"], audio, train=False)
        ex = (batch["example"] - stats["anim_input_mean"]) / stats["anim_input_std"]
        st, mu, lv = style_encoder.apply(
            p["style_encoder"], ex, lengths=batch["example_lengths"],
            encoder_type="attn", use_vae=True, style_embedding_size=64,
            train=False, sample_rng=jax.random.PRNGKey(0),
        )
        st_t = jnp.repeat(st[:, None], T, axis=1)
        out = decoder.rollout(
            p["decoder"], *s0, gaze, sp, st_t,
            stats["anim_input_mean"], stats["anim_input_std"],
            stats["anim_output_mean"], stats["anim_output_std"], 1 / 60.0,
        )
        O = dict(zip(("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"), out))
        return cl(O, W, gaze, parents, 1 / 60, mu, lv, 0)[0]

    timed("value_and_grad(no dropout)", jax.jit(jax.grad(loss_nodrop)), params)

if which in ("dropgrad", "all3"):
    from zeggs_tpu.train.loop import make_loss_fn

    batch = {
        **{k: v for k, v in W.items()},
        "audio_features": jnp.asarray(rng.normal(size=(B, T, 81)).astype(np.float32)),
        "gaze_pos": gaze,
        "example": jnp.asarray(rng.normal(size=(B, 512, g.POSE_IN)).astype(np.float32)),
        "example_lengths": jnp.full((B,), 256, jnp.int32),
    }
    loss_fn = make_loss_fn(opts, {k: np.asarray(v) for k, v in stats.items()}, parents, 1 / 60.0)
    f = jax.jit(jax.grad(lambda pp: loss_fn(pp, batch, jnp.float32(0), jax.random.PRNGKey(0))[0]))
    timed("grad(full loss_fn WITH dropout, threefry)", f, params)

if which in ("raw_rng", "all3"):
    k = jax.random.PRNGKey(0)
    f = jax.jit(lambda kk: jax.random.bernoulli(kk, 0.9, (32, 4, 512, 512)).sum())
    timed("bernoulli (32,4,512,512) threefry", f, k)

if which in ("stepvariants", "all4"):
    from zeggs_tpu.train.loop import make_train_step
    from zeggs_tpu.parallel import create_mesh
    import jax.random as jrandom

    batch = {
        **{k: v for k, v in W.items()},
        "audio_features": jnp.asarray(rng.normal(size=(B, T, 81)).astype(np.float32)),
        "gaze_pos": gaze,
        "example": jnp.asarray(rng.normal(size=(B, 512, g.POSE_IN)).astype(np.float32)),
        "example_lengths": jnp.full((B,), 256, jnp.int32),
    }
    np_stats = {k: np.asarray(v) for k, v in stats.items()}

    def run_steps(name, mesh, donate):
        p = init_networks(jax.random.PRNGKey(0), opts, dims, nlabels=19)
        tx, step = make_train_step(opts, np_stats, parents, 1 / 60.0, mesh=mesh, donate=donate)
        o = tx.init(p)
        p, o, m = step(p, o, batch, jnp.float32(0), jrandom.PRNGKey(0))
        jax.block_until_ready(m["total_loss"])
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            p, o, m = step(p, o, batch, jnp.float32(i), jrandom.PRNGKey(i))
            jax.block_until_ready(m["total_loss"])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {float(np.median(ts))*1000:.0f} ms", flush=True)

    run_steps("step mesh=None donate=False", None, False)
    run_steps("step mesh=1dev donate=True", create_mesh(1), True)
