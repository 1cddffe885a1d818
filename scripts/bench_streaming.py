"""Streaming-session latency benchmark on the real device.

Simulates a live feed: a full-scale v1 model, audio pushed in fixed-size
chunks, measuring
  * time-to-first-gesture-frame (wall clock from the first push),
  * per-push compute latency p50/p95 (must beat the push period for
    realtime operation),
  * end-to-end realtime factor.

Note the axon tunnel adds ~25-70 ms per dispatch; `--quantum` batches
decoder chunks to trade a few frames of lag for fewer dispatches.

    python scripts/bench_streaming.py --seconds 30 --push-ms 500 --quantum 16
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import os

import jax

# honor a CPU-only request even when the TPU plugin's sitecustomize
# force-overrides JAX_PLATFORMS (same contract as bench_serve)
if os.environ.get("JAX_PLATFORMS", "") == "cpu" and jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench_serve import build_corpus  # noqa: E402  (scripts/ sibling)
from zeggs_tpu.infer.generate import GesturePipeline  # noqa: E402
from zeggs_tpu.io import wav  # noqa: E402


def run_session(pipe, style, audio, push, quantum):
    sess = pipe.streaming_session([style], temperature=1.0, seed=1, quantum=quantum)
    t0 = time.perf_counter()
    ttff = None
    lats = []
    for o in range(0, len(audio), push):
        t1 = time.perf_counter()
        new = sess.push(audio[o : o + push])
        lats.append(time.perf_counter() - t1)
        if ttff is None and new["root_pos"].shape[0] and sess.frames_emitted > 1:
            ttff = time.perf_counter() - t0
    t1 = time.perf_counter()
    sess.finish()
    finish_lat = time.perf_counter() - t1
    total = time.perf_counter() - t0
    return dict(
        ttff_s=ttff, push_p50_s=float(np.percentile(lats, 50)),
        push_p95_s=float(np.percentile(lats, 95)), finish_s=finish_lat,
        total_s=total, frames=sess.frames_emitted,
        realtime_factor=(sess.frames_emitted / 60.0) / total,
    )


def run_http_session(pipe, style, audio, push, quantum):
    """Same live feed through the daemon's /stream endpoints: measures what
    a network client of the serving daemon actually sees (HTTP + base64 +
    scheduler-queue overhead on top of the session engine)."""
    import base64
    import urllib.request

    from zeggs_tpu.serve.server import GestureServer

    srv = GestureServer(pipe, max_batch=8, max_wait_ms=10)
    port = srv.start()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    try:
        style_bvh, style_frames = style
        entry = {"bvh_b64": base64.b64encode(
            Path(style_bvh).read_bytes()).decode()}
        if style_frames is not None:  # same example shape = same programs
            entry["frames"] = list(style_frames)
        t0 = time.perf_counter()
        out = post("/stream/start",
                   {"styles": [entry], "seed": 1, "quantum": quantum})
        sid = out["session_id"]
        ttff = None
        lats = []
        frames = out["frames"]["n"]
        for o in range(0, len(audio), push):
            chunk = np.asarray(audio[o:o + push], "<f4")
            t1 = time.perf_counter()
            r = post("/stream/push", {
                "session_id": sid,
                "audio_f32_b64": base64.b64encode(chunk.tobytes()).decode()})
            lats.append(time.perf_counter() - t1)
            frames += r["frames"]["n"]
            if ttff is None and frames > 1:
                ttff = time.perf_counter() - t0
        t1 = time.perf_counter()
        fin = post("/stream/finish", {"session_id": sid})
        finish_lat = time.perf_counter() - t1
        total = time.perf_counter() - t0
        frames += fin["frames"]["n"]
        return dict(
            ttff_s=ttff, push_p50_s=float(np.percentile(lats, 50)),
            push_p95_s=float(np.percentile(lats, 95)), finish_s=finish_lat,
            total_s=total, frames=frames,
            realtime_factor=(frames / 60.0) / total,
        )
    finally:
        srv.stop()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--push-ms", type=float, default=500.0)
    ap.add_argument("--quantum", type=int, default=16)
    ap.add_argument("--http", action="store_true",
                    help="also drive the daemon's /stream endpoints and "
                         "report the client-observed numbers")
    ap.add_argument("--root", type=str, default="/tmp/zeggs_stream_bench")
    ap.add_argument("--budget", type=float, default=0.0,
                    help="wall-clock budget in seconds (0 = unbounded): a "
                    "watchdog thread prints the partial JSON and exits 0 at "
                    "budget+5 s even if a cold compile holds the main "
                    "thread (same artifact contract as bench_serve)")
    args = ap.parse_args(argv)
    t_main = time.perf_counter()

    def remaining():
        return (args.budget - (time.perf_counter() - t_main)
                if args.budget else float("inf"))

    def emit(d):
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in d.items()}))

    r = {"phase": "corpus"}
    if args.budget:
        import threading

        finished = threading.Event()

        def _watchdog():
            if not finished.wait(timeout=args.budget + 5.0):
                r["watchdog_fired"] = True
                r["elapsed_s"] = round(time.perf_counter() - t_main, 1)
                emit(r)
                os._exit(0)

        threading.Thread(target=_watchdog, daemon=True).start()

    t0 = time.perf_counter()
    net_dir, data_dir, requests, _, opts, _lengths = build_corpus(
        Path(args.root), n_requests=1)
    r["corpus_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    pipe = GesturePipeline(net_dir, data_dir, options=opts, fused_b1=False)
    r["pipe_init_s"] = round(time.perf_counter() - t0, 1)
    print(f"# corpus: {r['corpus_s']}s, pipeline init: {r['pipe_init_s']}s",
          file=sys.stderr)
    style = requests[0].styles[0]

    sr = pipe.mel_cfg.sampling_rate
    rng = np.random.default_rng(0)
    n = int(args.seconds * sr)
    t = np.arange(n) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
             + 0.05 * rng.normal(size=n)).astype(np.float32)
    push = int(args.push_ms / 1e3 * sr)

    # cold run compiles the bucketed programs (persisted as each finishes);
    # the warm run is the number
    r["phase"] = "cold_session"
    t0 = time.perf_counter()
    run_session(pipe, style, audio, push, args.quantum)
    cold_s = time.perf_counter() - t0
    print(f"# cold session: {cold_s:.1f}s", file=sys.stderr)
    r["phase"] = "warm_session"
    r.update(run_session(pipe, style, audio, push, args.quantum))
    r.update(seconds=args.seconds, push_ms=args.push_ms, quantum=args.quantum,
             cold_session_s=round(cold_s, 1))
    # the HTTP session shares this process's pipeline and jit cache (the
    # device-program set is session-independent), so after the in-process
    # warm session it costs ~total_s + server overhead — the cold_s term
    # would double-count the one-time compile/deserialize already paid
    if args.http and remaining() < 1.5 * r["total_s"] + 15:
        print(f"# http phase skipped: {remaining():.0f}s left", file=sys.stderr)
        r["http_skipped_over_budget"] = True
        args.http = False
    if args.http:
        r["phase"] = "http"
        h = run_http_session(pipe, style, audio, push, args.quantum)
        r["http"] = {k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in h.items()}
    r["phase"] = "done"
    if args.budget:
        finished.set()
    emit(r)


if __name__ == "__main__":
    main()
