"""End-to-end serving benchmark: the CSV-batch path at full ZEGGS scale.

Replays a synthetic 20-request evaluation CSV (generate.py:476-505 is the
reference equivalent) through BOTH serving modes:
  * sequential: generate_gesture per request (reference behavior), and
  * batched:    infer/batch.generate_batch — featurization, bucketed
                batched rollouts, BVH writes on a host thread pool.

Everything is measured end to end: WAV read + mel featurization + style-BVH
feature extraction + rollout + BVH serialization + wav copy. The model is
the full v1 architecture (75 joints, decoder GRU 2x1024) with random
weights — throughput is weight-value independent.

Prints one JSON line:
  {"serve_clips_per_s", "serve_frames_per_s", "seq_p50_s", "seq_p95_s",
   "batched_makespan_s", "n_requests", "total_frames"}
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

import os

import jax

# honor a CPU-only request even when the TPU plugin's sitecustomize
# force-overrides JAX_PLATFORMS (same contract as __graft_entry__)
if os.environ.get("JAX_PLATFORMS", "") == "cpu" and jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from zeggs_tpu import config as C  # noqa: E402
from zeggs_tpu.infer.batch import (  # noqa: E402
    Request, _round_up, generate_batch, plan_programs, warmup,
)
from zeggs_tpu.infer.generate import GesturePipeline, generate_gesture  # noqa: E402
from zeggs_tpu.io import bvh, checkpoint, wav  # noqa: E402
from zeggs_tpu.train.loop import init_networks  # noqa: E402

NJOINTS = 75
POSE_IN = 6 + NJOINTS * 15 + 3
POSE_OUT = 6 + NJOINTS * 15


def _skeleton():
    """75-joint skeleton with the names the featurizer resolves."""
    names = ["Hips", "Spine", "Spine1", "Spine2", "Spine3", "Neck", "Head"]
    parents = [-1, 0, 1, 2, 3, 4, 5]
    while len(names) < NJOINTS:
        i = len(names)
        names.append(f"Joint{i}")
        parents.append((i - 1) % 7)  # bushy tree off the spine chain
    return names, parents


def _motion(nframes, seed):
    rng = np.random.default_rng(seed)
    names, parents = _skeleton()
    t = np.linspace(0, 2 * np.pi, nframes)[:, None, None]
    phase = rng.uniform(0, 2 * np.pi, (1, NJOINTS, 3))
    amp = rng.uniform(3, 20, (1, NJOINTS, 3))
    rotations = (amp * np.sin(2 * t + phase)).astype(np.float32)
    offsets = rng.uniform(-8, 8, (NJOINTS, 3)).astype(np.float32)
    offsets[0] = 0
    positions = np.repeat(offsets[None], nframes, axis=0).astype(np.float32)
    positions[:, 0, 1] += 95.0
    positions[:, 0, 0] += np.linspace(0, 20, nframes)
    return {
        "rotations": rotations, "positions": positions, "offsets": offsets,
        "parents": np.asarray(parents, np.int32), "names": names,
        "order": "zyx", "frametime": 1.0 / 60.0,
    }


def build_corpus(root: Path, n_requests=20, seed=0):
    """Synthetic full-scale data dir + networks + request list.

    Everything here is deterministic (fixed seeds), so a marker file lets
    re-runs under the same root skip the expensive parts (host-side
    init_networks of the full v1 dims + BVH/npz writes, ~60 s) — only the
    request wavs (~1 s) are rewritten. The marker embeds the layout dims so
    a dims change invalidates the cache.
    """
    root = Path(root)
    data_dir, net_dir, clips_dir = root / "processed", root / "models", root / "clips"
    for d in (data_dir, net_dir, clips_dir):
        d.mkdir(parents=True, exist_ok=True)
    names, parents = _skeleton()

    fingerprint = f"{NJOINTS}-{POSE_IN}-{POSE_OUT}-corpus-v1"
    marker = root / "corpus_marker.txt"
    style_paths = [clips_dir / f"style_{i}.bvh" for i in range(4)]
    cached = (
        marker.exists() and marker.read_text() == fingerprint
        and all(p.exists() for p in style_paths)
        and all((net_dir / f"{n}.npz").exists()
                for n in ("speech_encoder", "decoder", "style_encoder"))
    )
    if cached:
        opts = C.Options()
        rng = np.random.default_rng(seed)
        requests, total_frames, lengths = [], 0, []
        for i in range(n_requests):
            seconds = float(rng.uniform(4.0, 12.0))
            n = int(seconds * 16000)
            t = np.arange(n) / 16000
            audio = (0.3 * np.sin(2 * np.pi * 220 * t)
                     * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
                     + 0.05 * rng.normal(size=n)).astype(np.float32)
            ap = clips_dir / f"req_{i}.wav"
            wav.write_wavefile(ap, np.clip(audio, -0.99, 0.99), 16000)
            n_frames = int(round(60.0 * seconds))
            total_frames += n_frames
            lengths.append(n_frames)
            requests.append(Request(
                audio=ap, styles=[(style_paths[i % 4], (8, 8 + 256))],
                file_name=f"req_{i}", temperature=1.0, seed=1234 + i,
            ))
        return net_dir, data_dir, requests, total_frames, opts, lengths

    (data_dir / "data_definition.json").write_text(json.dumps({
        "dt": 1.0 / 60.0, "label_names": ["Neutral"], "parents": parents,
        "bone_names": names,
    }))
    conf = C.PipelineConfig(audio_conf=C.MelConfig(normalize_loudness=False)).to_dict()
    (data_dir / "data_pipeline_conf.json").write_text(json.dumps(conf))
    rng = np.random.default_rng(3)
    np.savez(
        data_dir / "stats.npz",
        audio_input_mean=rng.normal(size=81).astype(np.float32) * 0.1,
        audio_input_std=np.float32(1.0),
        anim_input_mean=np.zeros(POSE_IN, np.float32),
        anim_input_std=np.ones(POSE_IN, np.float32),
        anim_output_mean=np.zeros(POSE_OUT, np.float32),
        anim_output_std=np.ones(POSE_OUT, np.float32),
    )

    opts = C.Options()  # full v1 dimensions
    key = jax.random.PRNGKey(0)
    dims = dict(num_audio_features=81, pose_input_size=POSE_IN, pose_output_size=POSE_OUT)
    params = init_networks(key, opts, dims, nlabels=1)
    checkpoint.save(net_dir / "speech_encoder.npz", params["speech_encoder"])
    checkpoint.save(net_dir / "decoder.npz", params["decoder"])
    checkpoint.save(net_dir / "style_encoder.npz", params["style_encoder"])

    # style examples: 4 shared BVH clips of 512 frames
    style_paths = []
    for i in range(4):
        p = clips_dir / f"style_{i}.bvh"
        bvh.save(p, _motion(512, seed=100 + i))
        style_paths.append(p)

    rng = np.random.default_rng(seed)
    requests, total_frames, lengths = [], 0, []
    for i in range(n_requests):
        seconds = float(rng.uniform(4.0, 12.0))
        n = int(seconds * 16000)
        t = np.arange(n) / 16000
        audio = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
                 + 0.05 * rng.normal(size=n)).astype(np.float32)
        ap = clips_dir / f"req_{i}.wav"
        wav.write_wavefile(ap, np.clip(audio, -0.99, 0.99), 16000)
        n_frames = int(round(60.0 * seconds))
        total_frames += n_frames
        lengths.append(n_frames)
        requests.append(Request(
            audio=ap, styles=[(style_paths[i % 4], (8, 8 + 256))],
            file_name=f"req_{i}", temperature=1.0, seed=1234 + i,
        ))
    marker.write_text(fingerprint)
    return net_dir, data_dir, requests, total_frames, opts, lengths


def main(argv=None, quiet=False):
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--root", type=str, default="/tmp/zeggs_serve_bench")
    ap.add_argument("--skip-sequential", action="store_true")
    ap.add_argument("--daemon", action="store_true",
                    help="also benchmark the HTTP daemon (zeggs_tpu/serve): "
                    "all requests fired as concurrent POSTs through the "
                    "dynamic micro-batcher")
    ap.add_argument("--warm-only", action="store_true",
                    help="only run the compile-warmup phase (populate the "
                    "persistent cache for every serving program this bench "
                    "would execute), print its JSON, and exit")
    ap.add_argument("--budget", type=float, default=0.0,
                    help="wall-clock budget in seconds (0 = unbounded). "
                    "Phases run in priority order (warmup -> batched -> "
                    "daemon -> sequential); a phase whose estimated cost "
                    "exceeds the remaining budget is skipped and marked in "
                    "the JSON line, which is ALWAYS printed. The warmup "
                    "phase compiles one program at a time with a deadline "
                    "check between programs, and a WATCHDOG thread prints "
                    "the partial JSON and exits 0 if even a single compile "
                    "overruns the whole budget (round-4 lesson: an all-cold "
                    "round compiles ~18 bucket programs through the tunnel, "
                    "minutes each, and the in-flight compile can't be "
                    "preempted from the main thread).")
    args = ap.parse_args(argv)
    t_main = time.perf_counter()

    def remaining():
        return (args.budget - (time.perf_counter() - t_main)) if args.budget else float("inf")

    # The artifact contract: this process ALWAYS prints one JSON line.
    # Budget checks between phases bound the usual case; the watchdog is
    # the backstop for the unpreemptible one (a cold XLA compile through
    # the remote tunnel blocks the main thread for minutes).
    result = {}
    finished = threading.Event()
    if args.budget and not quiet:
        def _watchdog():
            if not finished.wait(timeout=args.budget + 5.0):
                out = dict(result)
                out["watchdog_fired"] = True
                out["elapsed_s"] = round(time.perf_counter() - t_main, 1)
                print(json.dumps(out), flush=True)
                os._exit(0)

        threading.Thread(target=_watchdog, daemon=True).start()

    root = Path(args.root)
    result["phase"] = "corpus"  # watchdog partials say where the cut hit
    t0 = time.perf_counter()
    net_dir, data_dir, requests, total_frames, opts, lengths = build_corpus(
        root, args.requests)
    result["corpus_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    result["pipe_init_s"] = round(time.perf_counter() - t0, 1)
    print(f"# corpus: {result['corpus_s']}s, pipeline init: "
          f"{result['pipe_init_s']}s", file=sys.stderr)
    result["phase"] = "warmup"

    # ---- warmup: compile every program this bench will execute, one at a
    # time, leaving a measurement reserve. Each finished compile persists
    # (in-process jit cache + /tmp/zeggs_jax_cache), so even a cut-off warm
    # phase makes the next run cheaper. ---------------------------------
    reserve_s = 0.0 if args.warm_only else 90.0
    deadline = (time.monotonic() + max(5.0, remaining() - reserve_s)
                if args.budget else None)
    t0 = time.perf_counter()
    warm = warmup(
        pipe, lengths, bucket=256, max_batch=32,
        all_pow2=args.daemon or args.warm_only,
        style_jobs=[(256, len(requests))],
        deadline=deadline,
        log=lambda m: print(f"# {m}", file=sys.stderr),
    )
    result["warmup_s"] = round(time.perf_counter() - t0, 1)
    result["warmup_programs"] = len(warm["compiled"])
    result["warmup_complete"] = warm["complete"]
    print(f"# warmup: {result['warmup_s']}s, {len(warm['compiled'])} programs"
          f" ({'complete' if warm['complete'] else 'cut off'})",
          file=sys.stderr)
    if args.warm_only:
        finished.set()
        if not quiet:
            print(json.dumps(result))
        return result

    # fall back to the requests whose WHOLE length bucket compiled: dropping
    # only whole buckets keeps the survivors' chunking (and therefore their
    # program shapes) identical to what was warmed
    if not warm["complete"]:
        compiled = set(warm["compiled"])
        plan_by_t = {}
        for t, b in plan_programs(lengths, bucket=256, max_batch=32):
            plan_by_t.setdefault(t, []).append((t, b))
        ok_t = {t for t, progs in plan_by_t.items()
                if all(p in compiled for p in progs)}
        kept = [(req, n) for req, n in zip(requests, lengths)
                if max(256, _round_up(n, 256)) in ok_t]
        result["requests_dropped_cold"] = len(requests) - len(kept)
        print(f"# warmup cut off: dropping {result['requests_dropped_cold']} "
              f"request(s) in un-compiled buckets", file=sys.stderr)
        requests = [r for r, _ in kept]
        total_frames = sum(n for _, n in kept)
        if not requests:
            result["failed"] = "no serving bucket compiled within budget"
            finished.set()
            if not quiet:
                print(json.dumps(result))
            return result

    # ---- batched serving path (the TPU-native mode) ----------------------
    result["phase"] = "batched"
    out_b = root / "out_batched"
    t0 = time.perf_counter()
    written = generate_batch(pipe, requests, out_b, bucket=256, max_batch=32)
    makespan = time.perf_counter() - t0
    print(f"# batched first pass: {makespan:.1f}s", file=sys.stderr)
    assert len(written) == len(requests)
    # warm runs (compiles cached): per-dispatch tunnel overhead is VARIABLE
    # (25-70 ms) so a single warm makespan is +-0.5 s noisy — report the
    # median of three (fewer if the budget is tight)
    warm_spans = []
    n_warm = 3 if remaining() > 6 * makespan else 1
    for _ in range(n_warm):
        t0 = time.perf_counter()
        generate_batch(pipe, requests, out_b, bucket=256, max_batch=32)
        warm_spans.append(time.perf_counter() - t0)
    makespan_warm = float(np.median(warm_spans))

    result.update({
        "n_requests": len(requests),
        "total_frames": total_frames,
        "serve_clips_per_s": round(len(requests) / makespan_warm, 3),
        "serve_frames_per_s": round(total_frames / makespan_warm, 1),
        "batched_makespan_s": round(makespan_warm, 3),
        "batched_makespan_first_s": round(makespan, 3),
    })

    # ---- HTTP daemon (dynamic micro-batching; the VERDICT-r3 load-proof
    # numbers — runs BEFORE sequential because its p50/p99-under-load is
    # the artifact headline and sequential is only the reference-style
    # comparison) --------------------------------------------------------
    # estimate: one warm pass then 3 measured passes at warm speed. When the
    # warmup phase COMPLETED, every rollout program the daemon can hit is
    # already in the in-process jit cache (batch_pad="full" on TPU means one
    # program per length bucket), so its warm pass costs ~makespan_warm —
    # using the first-pass `makespan` there double-counts the one-time
    # per-process persistent-cache deserialize and skipped the daemon by
    # 9 s in the round-5 rehearsal despite 142 s of real headroom.
    daemon_first = makespan_warm if warm["complete"] else makespan
    if args.daemon and remaining() < daemon_first + 4 * makespan_warm + 15:
        print(f"# daemon phase skipped: {remaining():.0f}s left", file=sys.stderr)
        result["daemon_skipped_over_budget"] = True
        args.daemon = False
    if args.daemon:
        result["phase"] = "daemon"
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from zeggs_tpu.serve import GestureServer

        srv = GestureServer(pipe, max_batch=32, max_wait_ms=50, bucket=256)
        port = srv.start()
        payloads = [
            json.dumps({
                "audio_path": str(req.audio),
                "styles": [{"bvh_path": str(req.styles[0][0]),
                            "frames": list(req.styles[0][1])}],
                "seed": req.seed, "file_name": req.file_name,
            }).encode()
            for req in requests
        ]

        def post(body):
            t0 = time.perf_counter()
            r = urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{port}/synthesize", data=body,
                    headers={"Content-Type": "application/json"},
                ),
                timeout=1800,
            )
            out = json.loads(r.read())
            return time.perf_counter() - t0, out["batch_size"], len(out["bvh"])

        def one_pass():
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=len(payloads)) as pool:
                outs = list(pool.map(post, payloads))
            return time.perf_counter() - t0, outs

        try:
            t0 = time.perf_counter()
            one_pass()  # warm (rollout buckets already compiled above, but
            # the daemon's own style-encode batch shapes may be new)
            print(f"# daemon warm pass: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            spans, all_lat, all_bs = [], [], []
            for _ in range(3 if remaining() > 6 * makespan_warm else 1):
                span, outs = one_pass()
                spans.append(span)
                all_lat.extend(o[0] for o in outs)
                all_bs.extend(o[1] for o in outs)
            lat = np.asarray(all_lat)
            result["daemon_makespan_s"] = round(float(np.median(spans)), 3)
            result["daemon_clips_per_s"] = round(
                len(requests) / float(np.median(spans)), 3)
            result["daemon_p50_s"] = round(float(np.percentile(lat, 50)), 3)
            result["daemon_p99_s"] = round(float(np.percentile(lat, 99)), 3)
            result["daemon_batch_size_mean"] = round(float(np.mean(all_bs)), 2)
            snap = srv.stats.snapshot()
            result["daemon_rejected_total"] = snap["rejected_total"]
            result["daemon_timeouts_total"] = snap["timeouts_total"]
            result["daemon_errors_total"] = snap["errors_total"]
        except Exception as e:  # still emit every number measured so far
            print(f"# daemon phase failed: {e}", file=sys.stderr)
            result["daemon_failed"] = str(e)[:200]
        finally:
            srv.stop()

    # ---- sequential replay (reference-style, per-clip latency; LOWEST
    # priority: its numbers are a comparison point, not a headline) --------
    seq_est = (3 * makespan_warm if warm["complete"] else 2 * makespan) + 10
    if not args.skip_sequential and remaining() < seq_est:
        print(f"# sequential phase skipped: {remaining():.0f}s left",
              file=sys.stderr)
        result["seq_skipped_over_budget"] = True
        args.skip_sequential = True
    if not args.skip_sequential:
        result["phase"] = "sequential"
        out_s = root / "out_seq"
        # two passes: the first compiles every rollout length bucket
        # (minutes each through the axon tunnel); the second measures the
        # warm steady-state serving latency
        t0 = time.perf_counter()
        try:
            for ipass in range(2):
                lat = []
                for req in requests:
                    t0r = time.perf_counter()
                    generate_gesture(
                        req.audio, req.styles, network_path=net_dir,
                        data_path=data_dir, results_path=out_s,
                        temperature=req.temperature, seed=req.seed,
                        file_name=req.file_name, pipeline=pipe,
                    )
                    lat.append(time.perf_counter() - t0r)
                if ipass == 0 and remaining() < sum(lat) + 5:
                    print("# sequential warm pass skipped: "
                          f"{remaining():.0f}s left", file=sys.stderr)
                    result["seq_warm_skipped_over_budget"] = True
                    break
            lat = np.asarray(lat)
            # compile-inclusive (cold) latencies are a different population
            # than warm ones: when the warm pass was skipped, emit the cold
            # percentiles under DISTINCT keys so cross-round comparisons can
            # never silently mix the two distributions (ADVICE r4)
            pre = ("seq_cold_" if result.get("seq_warm_skipped_over_budget")
                   else "seq_")
            result[pre + "p50_s"] = round(float(np.percentile(lat, 50)), 3)
            result[pre + "p95_s"] = round(float(np.percentile(lat, 95)), 3)
            result[pre + "p99_s"] = round(float(np.percentile(lat, 99)), 3)
            result[pre + "clips_per_s"] = round(len(lat) / float(lat.sum()), 3)
        except Exception as e:
            print(f"# sequential phase failed: {e}", file=sys.stderr)
            result["seq_failed"] = str(e)[:200]
        print(f"# sequential phase: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    result["phase"] = "done"
    finished.set()
    if not quiet:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
