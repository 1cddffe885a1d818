"""Roofline analysis of the full-dims training step (VERDICT r3 item 8).

Builds the production device-corpus train step (B=32 x 256 frames, full v1
dims, bf16 matmuls, unroll=4 — identical program to Trainer/_run_epochs_device
and scripts/device_train_bench.py), AOT-compiles it (persistent-cache hit on
a warm machine; no step is executed), and reads the compiled executable's
cost analysis: total FLOPs and HBM bytes accessed. From those it derives the
speed-of-light step time on v5e:

    bound = max(flops / PEAK_FLOPS, bytes / HBM_BW)

and prints it next to the analytic weight-streaming model:

  per scanned frame the step must move the decoder-cell weights (18.9 M
  params = 37.8 MB bf16) once for the forward pass and once for the
  transposed (dgrad) pass, plus read+write the dW accumulator that
  jax.lax.scan's transpose carries across frames (bf16 cotangent of the
  bf16-cast weights; unroll=4 lets XLA fuse 4 accumulator updates into one
  HBM round trip). Activations are negligible at B=32 (~1 MB/frame vs
  ~38 MB of weights), so the step is HBM-bound: arithmetic intensity is
  ~B FLOPs/byte = 32, far under the v5e ridge of ~240.

Run on the TPU (compile-only; safe next to other jobs but intended for a
quiet chip):

    python scripts/train_roofline.py [--bf16] [--unroll 4] [--measured-ms 34]
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from device_train_bench import build_step

# TPU v5e (one chip). Sources: public v5e spec sheet.
PEAK_BF16_FLOPS = 197e12
PEAK_FP32_FLOPS = 197e12 / 4  # fp32 runs as multi-pass bf16 on the MXU
HBM_BW = 819e9

# Decoder-cell weights streamed per scanned frame (full v1 dims; counted
# from models/decoder.init: gru0 w_ih 2286x3072 + w_hh 1024x3072, gru1
# 2x 1024x3072, layer0 1262x1024, out 1024x1131).
CELL_PARAMS = 18_910_208


def build_compiled(compute_dtype, unroll, batchsize=32):
    """AOT-compile the exact program device_train_bench times (shared
    builder, so bench and roofline can never drift apart)."""
    b = build_step(compute_dtype, unroll, batchsize)
    rng = np.random.default_rng(0)
    idx0 = rng.integers(0, len(b["ds"].window_starts), size=batchsize)
    args = b["put_idx"](*b["corpus"].sample_indices(idx0, 512))
    return b["step"].lower(b["params_s"], b["opt_s"], *args,
                           jnp.float32(0.0), b["key"]).compile()


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="sustained production step time to compare against")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    dtype = "bfloat16" if args.bf16 else "float32"
    compiled = build_compiled(dtype, args.unroll)
    ca = compiled.cost_analysis()
    if not isinstance(ca, dict):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byac = float(ca.get("bytes accessed", 0.0))

    peak = PEAK_BF16_FLOPS if dtype == "bfloat16" else PEAK_FP32_FLOPS
    t_flops = flops / peak
    t_bytes = byac / HBM_BW
    bound_ms = max(t_flops, t_bytes) * 1e3

    # Analytic weight-streaming model for cross-checking the compiler's
    # bytes-accessed number (see module docstring).
    wbytes = CELL_PARAMS * (2 if dtype == "bfloat16" else 4)
    frames = 256
    dw_roundtrips = 2.0 / args.unroll  # read+write fused across the unroll
    analytic = frames * wbytes * (1 + 1 + dw_roundtrips)
    # plus one optimizer pass over fp32 master weights + RAdam m/v (5 arrays
    # read, 3 written) and the fp32->bf16 weight cast read
    n_params = 23_301_227 + 81 * 64 + 64 * 64 * 4  # decoder + enc approx
    analytic += n_params * 4 * 8

    out = {
        "dtype": dtype, "unroll": args.unroll,
        "flops": flops, "bytes_accessed": byac,
        "t_flops_ms": round(t_flops * 1e3, 2),
        "t_bytes_ms": round(t_bytes * 1e3, 2),
        "bound_ms": round(bound_ms, 2),
        "analytic_bytes": analytic,
        "analytic_bytes_ms": round(analytic / HBM_BW * 1e3, 2),
        "arith_intensity_flops_per_byte": round(flops / max(byac, 1.0), 1),
    }
    if args.measured_ms is not None:
        out["measured_ms"] = args.measured_ms
        out["fraction_of_bound"] = round(bound_ms / args.measured_ms, 3)
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
