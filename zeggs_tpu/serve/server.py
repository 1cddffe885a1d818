"""HTTP serving daemon: dynamic micro-batched gesture synthesis.

The reference has no serving component — its CSV mode replays clips one
at a time (generate.py:476-505). On TPU the economics invert: one chip
synthesizes gesture frames orders of magnitude faster than realtime, so
the server's job is to keep the chip fed with BATCHES while holding tail
latency. Requests that arrive while the previous batch is on-device (or
within ``max_wait_ms`` of each other) coalesce into one bucketed batched
rollout (``infer.batch.generate_batch``), giving near-batched throughput
at interactive latencies.

Design:
  * one SCHEDULER thread owns all device work; HTTP handler threads only
    validate, enqueue, and wait on per-request futures (the jax dispatch
    stream stays single-threaded, which also matches the TPU tunnel's
    process serialization),
  * dynamic batching: after the first request of a window, drain the
    queue up to ``max_batch``, waiting at most ``max_wait_ms`` — while a
    batch is running on device, arrivals pile up and the next drain takes
    them all at once,
  * responses carry the BVH text inline (JSON), plus scheduling metadata
    (batch size, queue + synthesis latency) so clients can observe the
    batcher,
  * stdlib only (``http.server.ThreadingHTTPServer``): no new deps.
"""

from __future__ import annotations

import base64
import json
import shutil
import tempfile
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from queue import Empty, Queue
from typing import Optional

import numpy as np

from ..infer.batch import Request, generate_batch


@dataclass
class _Job:
    request: Request
    display_name: str = ""  # client-requested name (response only; the
    # filesystem always uses request.file_name = a server-issued id, so a
    # hostile or colliding client name can never shape a path)
    n_frames_hint: int = 0
    done: threading.Event = field(default_factory=threading.Event)
    bvh_text: Optional[str] = None
    error: Optional[str] = None
    t_enqueue: float = 0.0
    t_done: float = 0.0
    batch_size: int = 0
    abandoned: bool = False  # handler gave up (504): skip synthesis


class _Stats:
    """Rolling serving metrics (thread-safe)."""

    def __init__(self, window=1024):
        self.lock = threading.Lock()
        self.total = 0
        self.errors = 0
        self.latencies_ms = []  # rolling
        self.batch_sizes = []  # rolling
        self.window = window

    def record(self, latency_ms, batch_size, error=False):
        with self.lock:
            self.total += 1
            self.errors += int(error)
            self.latencies_ms.append(latency_ms)
            self.batch_sizes.append(batch_size)
            if len(self.latencies_ms) > self.window:
                self.latencies_ms = self.latencies_ms[-self.window :]
                self.batch_sizes = self.batch_sizes[-self.window :]

    def snapshot(self):
        with self.lock:
            lat = np.asarray(self.latencies_ms, np.float64)
            out = {
                "requests_total": self.total,
                "errors_total": self.errors,
                "window": len(lat),
            }
            if len(lat):
                out.update(
                    latency_ms_p50=round(float(np.percentile(lat, 50)), 1),
                    latency_ms_p99=round(float(np.percentile(lat, 99)), 1),
                    batch_size_mean=round(float(np.mean(self.batch_sizes)), 2),
                    batch_size_max=int(np.max(self.batch_sizes)),
                )
            return out


class GestureServer:
    """Micro-batching synthesis server around a ``GesturePipeline``.

    Start with ``serve_forever()`` (blocking) or ``start()`` (background
    thread; returns the bound port). POST /synthesize, GET /healthz,
    GET /stats.
    """

    def __init__(self, pipe, host="127.0.0.1", port=0, max_batch=64,
                 max_wait_ms=30, bucket=512, mesh=None):
        self.pipe = pipe
        self.max_batch = int(max_batch)
        self.max_wait_ms = float(max_wait_ms)
        self.bucket = int(bucket)
        self.mesh = mesh
        self.stats = _Stats()
        self._queue: Queue = Queue()
        self._seq = 0
        self._seq_lock = threading.Lock()
        self._stop = threading.Event()
        self._tmp_root = Path(tempfile.mkdtemp(prefix="zeggs_serve_"))

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet access log
                pass

            def _reply(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    self._reply(200, {
                        "ok": True,
                        "platform": jax.devices()[0].platform,
                        "style_encoding_type": server.pipe.style_encoding_type,
                    })
                elif self.path == "/stats":
                    self._reply(200, server.stats.snapshot())
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/synthesize":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                except Exception as e:
                    self._reply(400, {"error": f"bad json: {e}"})
                    return
                try:
                    job = server._make_job(payload)
                except Exception as e:
                    # any malformed payload is the client's fault: 400,
                    # never a dropped connection or a scheduler crash
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                server._queue.put(job)
                # generous bound: first-ever rollout shape can compile for
                # ~10 min through a remote-compile tunnel; a lost job
                # (scheduler died) still gets a 504 instead of hanging
                if not job.done.wait(timeout=3600):
                    job.abandoned = True  # scheduler will skip it
                    server.stats.record(3600e3, 0, error=True)
                    self._reply(504, {"error": "synthesis timed out"})
                    return
                if job.error is not None:
                    server.stats.record(
                        (job.t_done - job.t_enqueue) * 1e3, job.batch_size, error=True
                    )
                    self._reply(500, {"error": job.error})
                    return
                latency_ms = (job.t_done - job.t_enqueue) * 1e3
                server.stats.record(latency_ms, job.batch_size)
                self._reply(200, {
                    "file_name": job.display_name,
                    "bvh": job.bvh_text,
                    "latency_ms": round(latency_ms, 1),
                    "batch_size": job.batch_size,
                })

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._scheduler = threading.Thread(target=self._run_scheduler, daemon=True)

    # -- request parsing ------------------------------------------------

    def _next_name(self):
        with self._seq_lock:
            self._seq += 1
            return f"r{self._seq:06d}"

    def _make_job(self, payload):
        """Validate a /synthesize JSON payload into a queued job.

        Payload: ``audio_path`` (server-visible file) or ``audio_wav_b64``
        (raw .wav bytes); ``styles``: list of {"bvh_path", "frames"?} /
        {"label"} entries (or shorthand ``style_path`` / ``style_label``);
        optional ``temperature``, ``seed``, ``first_pose``, ``blend_type``,
        ``blend_ratio``, ``file_name``. Validation failures raise
        ValueError -> HTTP 400 without touching the scheduler.

        The FILESYSTEM name is always a server-issued id (``r000042``):
        a client-supplied ``file_name`` is echoed back in the response but
        never shapes a path — no traversal via "../" or absolute names,
        and no output collisions between co-batched requests that picked
        the same name."""
        name = self._next_name()
        display_name = str(payload.get("file_name") or name)

        if payload.get("audio_wav_b64"):
            audio = self._tmp_root / "uploads" / f"{name}.wav"
            audio.parent.mkdir(parents=True, exist_ok=True)
            audio.write_bytes(base64.b64decode(payload["audio_wav_b64"]))
        elif payload.get("audio_path"):
            audio = Path(payload["audio_path"])
            if not audio.is_file():
                raise ValueError(f"audio_path not found: {audio}")
        else:
            raise ValueError("need audio_path or audio_wav_b64")

        raw_styles = payload.get("styles")
        if raw_styles is None:
            if payload.get("style_path"):
                raw_styles = [{"bvh_path": payload["style_path"],
                               "frames": payload.get("frames")}]
            elif payload.get("style_label") is not None:
                raw_styles = [{"label": payload["style_label"]}]
            else:
                raise ValueError("need styles / style_path / style_label")
        if not raw_styles:
            raise ValueError("styles must be non-empty")
        styles = []
        for s in raw_styles:
            if not isinstance(s, dict):
                raise ValueError(f"bad style entry: {s!r}")
            if "bvh_path" in s:
                p = Path(s["bvh_path"])
                if not p.is_file():
                    raise ValueError(f"style bvh not found: {p}")
                frames = tuple(s["frames"]) if s.get("frames") else None
                styles.append((p, frames))
            elif "label" in s:
                label = s["label"]
                if isinstance(label, str):
                    if label not in self.pipe.label_names:
                        raise ValueError(f"unknown label: {label}")
                elif not (isinstance(label, int)
                          and 0 <= label < len(self.pipe.label_names)):
                    raise ValueError(f"label index out of range: {label!r}")
                styles.append(label)
            else:
                raise ValueError(f"bad style entry: {s}")

        first_pose = payload.get("first_pose")
        if first_pose is not None:
            first_pose = Path(first_pose)
            if not first_pose.is_file():
                raise ValueError(f"first_pose not found: {first_pose}")
        if first_pose is None and not any(isinstance(s, tuple) for s in styles):
            raise ValueError("label styles require first_pose (generate.py:276)")

        n_styles = len(styles)
        blend_ratio = payload.get("blend_ratio") or [1.0 / n_styles] * n_styles
        if len(blend_ratio) != n_styles:
            raise ValueError("blend_ratio length != styles length")

        req = Request(
            audio=audio,
            styles=styles,
            file_name=name,
            temperature=float(payload.get("temperature", 1.0)),
            seed=int(payload.get("seed", 1234)),
            first_pose=first_pose,
            blend_type=str(payload.get("blend_type", "add")),
            blend_ratio=[float(r) for r in blend_ratio],
        )
        job = _Job(request=req, display_name=display_name,
                   t_enqueue=time.perf_counter())
        return job

    # -- scheduler -------------------------------------------------------

    def _drain_batch(self):
        """Block for one job, then coalesce arrivals for up to
        max_wait_ms (or max_batch). While a previous batch was running,
        the queue has been filling — those all come out at once here."""
        try:
            first = self._queue.get(timeout=0.2)
        except Empty:
            return []
        jobs = [first]
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(jobs) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                jobs.append(self._queue.get(timeout=remaining))
            except Empty:
                break
        # a handler that already replied 504 has nobody reading the result
        return [j for j in jobs if not j.abandoned]

    def _run_scheduler(self):
        while not self._stop.is_set():
            try:
                self._run_one_batch()
            except Exception:  # keep serving even on unexpected errors
                import traceback

                traceback.print_exc()

    def _run_one_batch(self):
        jobs = self._drain_batch()
        if not jobs:
            return
        try:
            self._synthesize(jobs)
        except Exception:
            # one bad request (unreadable wav, wrong-fps style BVH, ...)
            # must not fail its co-batched neighbours: retry each job on
            # its own so only the offender reports the error
            if len(jobs) > 1:
                for j in jobs:
                    j.error = j.bvh_text = None  # cleared for the retry
                    try:
                        self._synthesize([j], batch_size=len(jobs))
                    except Exception:
                        pass  # the offender keeps its own j.error
        finally:
            uploads = self._tmp_root / "uploads"
            for j in jobs:
                if j.request.audio.parent == uploads:
                    j.request.audio.unlink(missing_ok=True)  # single-use
                j.done.set()

    def _synthesize(self, jobs, batch_size=None):
        out_dir = self._tmp_root / f"batch_{time.monotonic_ns()}"
        try:
            generate_batch(
                self.pipe, [j.request for j in jobs], out_dir,
                bucket=self.bucket, max_batch=self.max_batch, mesh=self.mesh,
            )
            for j in jobs:
                j.bvh_text = (out_dir / f"{j.request.file_name}.bvh").read_text()
        except Exception as e:
            for j in jobs:
                j.error = f"{type(e).__name__}: {e}"
            raise
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
            now = time.perf_counter()
            for j in jobs:
                j.t_done = now
                j.batch_size = batch_size or len(jobs)

    # -- lifecycle -------------------------------------------------------

    def start(self):
        """Serve in background threads; returns the bound port."""
        self._scheduler.start()
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self.port

    def serve_forever(self):
        self._scheduler.start()
        try:
            self._httpd.serve_forever()
        finally:
            self.stop()

    def stop(self):
        self._stop.set()
        self._httpd.shutdown()
        shutil.rmtree(self._tmp_root, ignore_errors=True)
