"""Cache-warmup preflight: compile every driver-bench program into the
persistent cache (/tmp/zeggs_jax_cache) BEFORE the end-of-round bench runs.

Any source edit inside the jitted rollout invalidates every serving-bucket
program at once (each costs minutes through the remote-compile tunnel), so
run this after the round's LAST rollout-touching edit — and make sure it has
EXITED before the driver bench starts: the tunnel serializes processes and a
leftover JAX client deadlocks the next one (VERDICT r4 item 1b).

Stages run as sequential subprocesses (one JAX client at a time):
  1. bench_serve --warm-only --daemon   (~18 rollout/speech/style programs)
  2. bench_streaming                    (streaming session + /stream daemon)
  3. bench.py --stage core              (B=2048 batched + fused B=1 shapes)
  4. device_train_bench fp32 + bf16     (the pjit train step, both dtypes)

    python scripts/warm_caches.py [--skip-core] [--skip-train]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(name, argv, timeout):
    t0 = time.time()
    print(f"== warm {name} (timeout {timeout}s)", flush=True)
    try:
        proc = subprocess.run([sys.executable] + argv, cwd=REPO,
                              capture_output=True, text=True, timeout=timeout)
        tail = (proc.stdout.strip().splitlines() or [""])[-1]
        print(f"   rc={proc.returncode} {time.time() - t0:.0f}s {tail[:200]}",
              flush=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        print(f"   TIMEOUT after {time.time() - t0:.0f}s (partial compiles "
              "still persisted)", flush=True)
        return False


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-core", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--timeout", type=float, default=2400.0,
                    help="per-stage subprocess timeout")
    args = ap.parse_args(argv)
    t = args.timeout

    ok = run("serve programs",
             [str(REPO / "scripts" / "bench_serve.py"), "--warm-only",
              "--daemon", "--requests", "20",
              "--root", "/tmp/zeggs_serve_bench"], t)
    ok &= run("streaming programs",
              [str(REPO / "scripts" / "bench_streaming.py"),
               "--seconds", "30", "--http",
               "--root", "/tmp/zeggs_stream_bench"], t)
    if not args.skip_core:
        ok &= run("core stage programs",
                  [str(REPO / "bench.py"), "--stage", "core"], t)
    if not args.skip_train:
        ok &= run("train step fp32",
                  [str(REPO / "scripts" / "device_train_bench.py"),
                   "--json"], t)
        ok &= run("train step bf16",
                  [str(REPO / "scripts" / "device_train_bench.py"),
                   "--json", "--bf16"], t)
    print("WARM_OK" if ok else "WARM_PARTIAL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
