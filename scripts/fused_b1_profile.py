"""B=1 latency: XLA scan rollout vs the fused whole-rollout Pallas kernel.

Runs the full v1 model (75 joints, GRU 2x1024) on a 10 s clip (600 frames)
on the real TPU, checks parity, and reports p50 latency for both paths.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from __graft_entry__ import AUDIO_DIM, NJOINTS, POSE_IN, POSE_OUT, _initial_state, _stats  # noqa: E402
from zeggs_tpu import config as C  # noqa: E402
from zeggs_tpu.models import decoder, speech_encoder  # noqa: E402
from zeggs_tpu.train.loop import init_networks  # noqa: E402


def median_time(fn, iters=10, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    T = int(seconds * 60)
    opts = C.Options()
    key = jax.random.PRNGKey(0)
    dims = dict(num_audio_features=AUDIO_DIM, pose_input_size=POSE_IN, pose_output_size=POSE_OUT)
    params = init_networks(key, opts, dims, nlabels=19)
    stats = {k: jnp.asarray(v) for k, v in _stats().items()}
    rng = np.random.default_rng(0)

    state0 = _initial_state(rng, 1, NJOINTS)
    audio = jnp.asarray(rng.normal(size=(1, T, AUDIO_DIM)).astype(np.float32))
    gaze = jnp.asarray(rng.normal(size=(1, T, 3)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(1, T, 64)).astype(np.float32))

    @jax.jit
    def speech_fn(audio):
        return speech_encoder.apply(params["speech_encoder"], audio, train=False)

    speech = jax.block_until_ready(speech_fn(audio))

    def make_xla(dtype):
        @jax.jit
        def fn(state0, gaze, speech, style):
            return decoder.rollout(
                params["decoder"], *state0, gaze, speech, style,
                stats["anim_input_mean"], stats["anim_input_std"],
                stats["anim_output_mean"], stats["anim_output_std"],
                1.0 / 60.0, compute_dtype=dtype, output_indices=(0, 1, 4, 5),
            )
        return fn

    # the axon tunnel adds a large, VARIABLE per-dispatch overhead (tens of
    # ms), so single-dispatch timings are meaningless — chain K rollouts
    # inside ONE jit (each feeding its last frame into the next initial
    # state) and divide.
    K = 10

    def chain(roll):
        def fn(state0, gaze, speech, style):
            s = state0
            for _ in range(K):
                out = roll(s, gaze, speech, style)
                s = tuple(o[:, -1] for o in out)
            return s
        return jax.jit(fn)

    def xla_roll(dtype):
        def roll(s0, g, sp, st):
            return decoder.rollout(
                params["decoder"], *s0, g, sp, st,
                stats["anim_input_mean"], stats["anim_input_std"],
                stats["anim_output_mean"], stats["anim_output_std"],
                1.0 / 60.0, compute_dtype=dtype,
            )
        return roll

    xla_bf16 = chain(xla_roll(jnp.bfloat16))
    t_xla = median_time(lambda: xla_bf16(state0, gaze, speech, style)) / K
    print(f"XLA scan  (bf16): {t_xla * 1e3:8.2f} ms for {seconds:.0f}s clip")

    fused = decoder.make_fused_b1_fn(
        params["decoder"], stats["anim_input_mean"], stats["anim_input_std"],
        stats["anim_output_mean"], stats["anim_output_std"], 1.0 / 60.0,
        weights_dtype=jnp.bfloat16, interpret=False,
    )
    fused_chain = chain(fused)
    t_fused = median_time(lambda: fused_chain(state0, gaze, speech, style)) / K
    print(f"fused kernel (bf16): {t_fused * 1e3:8.2f} ms  ({t_xla / t_fused:.2f}x)")
    fused_j = jax.jit(lambda s0, g, sp, st: tuple(fused(s0, g, sp, st)[i] for i in (0, 1, 4, 5)))

    # parity vs fp32 XLA (both low-precision paths should track it equally)
    xla_f32 = make_xla(jnp.float32)
    xla_bf16_one = make_xla(jnp.bfloat16)
    ref = jax.device_get(xla_f32(state0, gaze, speech, style))
    got = jax.device_get(fused_j(state0, gaze, speech, style))
    bfl = jax.device_get(xla_bf16_one(state0, gaze, speech, style))
    for name, r, g, b in zip(("root_pos", "root_rot", "lpos", "ltxy"), ref, got, bfl):
        e_fused = float(np.mean(np.abs(np.asarray(g) - np.asarray(r))))
        e_bf16 = float(np.mean(np.abs(np.asarray(b) - np.asarray(r))))
        print(f"  {name:9s} MAE vs fp32: fused {e_fused:.3e} | xla-bf16 {e_bf16:.3e}")

    # int8-quantized fused path (per-column weight scales, dynamic act quant)
    fused8 = decoder.make_fused_b1_fn(
        params["decoder"], stats["anim_input_mean"], stats["anim_input_std"],
        stats["anim_output_mean"], stats["anim_output_std"], 1.0 / 60.0,
        weights_dtype=jnp.int8, interpret=False,
    )
    fused8_chain = chain(fused8)
    t_fused8 = median_time(lambda: fused8_chain(state0, gaze, speech, style)) / K
    print(f"fused kernel (int8): {t_fused8 * 1e3:8.2f} ms  ({t_xla / t_fused8:.2f}x)")
    fused8_j = jax.jit(lambda s0, g, sp, st: tuple(fused8(s0, g, sp, st)[i] for i in (0, 1, 4, 5)))
    got8 = jax.device_get(fused8_j(state0, gaze, speech, style))
    for name, r, g in zip(("root_pos", "root_rot", "lpos", "ltxy"), ref, got8):
        e8 = float(np.mean(np.abs(np.asarray(g) - np.asarray(r))))
        print(f"  {name:9s} MAE vs fp32: int8-fused {e8:.3e}")

    nweights = (
        params["decoder"]["cell"]["layer0"]["w"].size
        + params["decoder"]["cell"]["gru0"]["w_ih"].size
        + params["decoder"]["cell"]["gru0"]["w_hh"].size
        + params["decoder"]["cell"]["gru1"]["w_ih"].size
        + params["decoder"]["cell"]["gru1"]["w_hh"].size
        + params["decoder"]["cell"]["out"]["w"].size
    )
    bound_ms = 1e3 * (T - 1) * (nweights * 2) / 819e9
    print(f"weight-streaming bound ~{bound_ms:.1f} ms bf16 / ~{bound_ms / 2:.1f} ms int8 (819 GB/s HBM)")


if __name__ == "__main__":
    main()
