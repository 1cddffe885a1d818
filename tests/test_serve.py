"""Serving daemon: HTTP surface, micro-batching, validation, stats."""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.synthetic import write_corpus
from zeggs_tpu.infer import GesturePipeline
from zeggs_tpu.io import bvh
from zeggs_tpu.serve import GestureServer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_corpus")
    data_dir, net_dir, clips, opts = write_corpus(root, n_clips=2, nframes=180)
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    srv = GestureServer(pipe, max_batch=8, max_wait_ms=50)
    port = srv.start()
    yield srv, port, clips, root
    srv.stop()


def _post(port, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesize",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=60) as r:
        return json.loads(r.read())


def _check_bvh(text, tmp_path, n_expected):
    p = tmp_path / "resp.bvh"
    p.write_text(text)
    anim = bvh.load(p)
    assert anim["rotations"].shape[0] == n_expected
    assert np.isfinite(anim["rotations"]).all()
    assert abs(anim["frametime"] - 1 / 60) < 1e-6
    return anim


def test_healthz(server):
    _, port, _, _ = server
    out = _get(port, "/healthz")
    assert out["ok"] is True
    assert out["style_encoding_type"] == "example"


def test_synthesize_single(server, tmp_path):
    _, port, clips, _ = server
    style_bvh, audio_wav = clips[0]
    out = _post(port, {
        "audio_path": str(audio_wav),
        "style_path": str(style_bvh),
        "seed": 7,
    })
    assert out["batch_size"] >= 1 and out["latency_ms"] > 0
    _check_bvh(out["bvh"], tmp_path, int(round(60 * 3.0)))


def test_synthesize_audio_b64_roundtrip(server, tmp_path):
    """Uploading the wav bytes inline must match serving the same file
    by path (same seed -> identical BVH text)."""
    _, port, clips, _ = server
    style_bvh, audio_wav = clips[1]
    by_path = _post(port, {
        "audio_path": str(audio_wav), "style_path": str(style_bvh), "seed": 3,
    })
    by_bytes = _post(port, {
        "audio_wav_b64": base64.b64encode(audio_wav.read_bytes()).decode(),
        "style_path": str(style_bvh), "seed": 3,
    })
    assert by_bytes["bvh"] == by_path["bvh"]


def test_concurrent_requests_coalesce(server, tmp_path):
    """While the scheduler is busy with one batch, queued arrivals must
    come out as ONE coalesced batch: occupy the device with a first
    request, then fire 3 concurrently — all three must report the same
    batch_size == 3."""
    _, port, clips, _ = server
    style_bvh, audio_wav = clips[0]

    def payload(seed):
        return {"audio_path": str(audio_wav), "style_path": str(style_bvh),
                "seed": seed}

    # occupy the scheduler (compiles are warm from the earlier tests, but
    # the rollout itself takes long enough on CPU to queue behind)
    blocker = threading.Thread(target=_post, args=(port, payload(1)))
    blocker.start()

    results = [None] * 3

    def worker(i):
        results[i] = _post(port, payload(100 + i))

    import time

    time.sleep(0.3)  # let the blocker enter the scheduler
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    blocker.join()

    sizes = sorted(r["batch_size"] for r in results)
    # all three queued while the blocker batch ran -> one batch of 3
    # (>= 2 tolerated: a slow thread start can miss the window)
    assert sizes[-1] >= 2, sizes
    for r in results:
        _check_bvh(r["bvh"], tmp_path, int(round(60 * 3.0)))

    stats = _get(port, "/stats")
    assert stats["requests_total"] >= 4
    assert stats["batch_size_max"] >= 2
    assert stats["latency_ms_p99"] >= stats["latency_ms_p50"]


def test_validation_errors(server):
    _, port, clips, _ = server
    style_bvh, audio_wav = clips[0]
    before = _get(port, "/stats")["requests_total"]
    cases = [
        {},  # no audio
        {"audio_path": "/nonexistent.wav", "style_path": str(style_bvh)},
        {"audio_path": str(audio_wav)},  # no style
        {"audio_path": str(audio_wav), "styles": []},  # empty styles
        {"audio_path": str(audio_wav), "styles": ["not-a-dict"]},
        {"audio_path": str(audio_wav), "style_label": "NotAStyle"},
        {"audio_path": str(audio_wav), "style_label": 99},  # index range
        {"audio_path": str(audio_wav), "style_label": 0},  # label w/o first_pose
        {"audio_path": str(audio_wav), "style_path": str(style_bvh),
         "blend_ratio": [0.5, 0.5]},  # ratio len mismatch
        {"audio_path": 12345, "style_path": str(style_bvh)},  # TypeError path
    ]
    for payload in cases:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(port, payload)
        assert exc.value.code == 400, payload

    # validation errors never reach the scheduler or the stats
    assert _get(port, "/stats")["requests_total"] == before


def test_hostile_file_name_is_not_a_path(server, tmp_path):
    """A traversal-shaped file_name must be echoed back verbatim but never
    shape a filesystem path (the server synthesizes under its own id)."""
    _, port, clips, _ = server
    style_bvh, audio_wav = clips[0]
    evil = "../../outside/evil"
    out = _post(port, {
        "audio_path": str(audio_wav), "style_path": str(style_bvh),
        "file_name": evil, "seed": 5,
    })
    assert out["file_name"] == evil
    _check_bvh(out["bvh"], tmp_path, int(round(60 * 3.0)))
    import pathlib

    assert not (pathlib.Path("/tmp") / "outside").exists()


def test_same_file_name_no_collision(server, tmp_path):
    """Two concurrent requests with the SAME file_name but different seeds
    must each get their own animation (server ids namespace the files)."""
    _, port, clips, _ = server
    style_bvh, audio_wav = clips[0]
    results = [None, None]

    def worker(i, seed):
        results[i] = _post(port, {
            "audio_path": str(audio_wav), "style_path": str(style_bvh),
            "file_name": "same", "seed": seed,
        })

    threads = [threading.Thread(target=worker, args=(i, 1000 + i)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0]["bvh"] != results[1]["bvh"]  # different seeds
    for r in results:
        _check_bvh(r["bvh"], tmp_path, int(round(60 * 3.0)))


def _post_code(port, payload, timeout=60):
    """POST returning (status_code, body-dict) without raising."""
    try:
        return 200, _post(port, payload, timeout=timeout)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.fixture()
def slow_server(tmp_path_factory):
    """Fresh server whose synthesis is an artificial 0.3 s sleep: load
    tests need a deterministically-busy scheduler, not real rollouts."""
    import time

    root = tmp_path_factory.mktemp("slow_serve")
    data_dir, net_dir, clips, opts = write_corpus(root, n_clips=1, nframes=120)
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    srv = GestureServer(pipe, max_batch=2, max_wait_ms=10, max_queue=4,
                        request_timeout_s=30.0, drain_s=10.0)

    def fake_synthesize(jobs, batch_size=None):
        time.sleep(0.3)
        now = time.perf_counter()
        for j in jobs:
            j.bvh_text = "FAKE_BVH"
            j.t_done = now
            j.batch_size = batch_size or len(jobs)

    srv._synthesize = fake_synthesize
    port = srv.start()
    yield srv, port, clips
    srv.stop()


def test_burst_beyond_queue_gets_429_and_stays_bounded(slow_server):
    """24 concurrent clients against max_queue=4/max_batch=2: the overflow
    must get instant 429 + Retry-After (not unbounded queue/thread growth),
    the admitted ones must all complete, and the accounting must add up
    (VERDICT r3 item 4)."""
    import time

    srv, port, clips = slow_server
    style_bvh, audio_wav = clips[0]
    payload = {"audio_path": str(audio_wav), "style_path": str(style_bvh)}

    n_clients = 24
    results = [None] * n_clients
    threads_before = threading.active_count()

    def client(i):
        results[i] = _post_code(port, dict(payload, seed=i))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    codes = [c for c, _ in results]
    n_ok, n_429 = codes.count(200), codes.count(429)
    assert n_ok + n_429 == n_clients, codes
    assert n_429 >= 1, "burst of 24 into a 4-deep queue must overflow"
    assert n_ok >= 4, "admitted requests must still complete"
    for c, body in results:
        if c == 200:
            assert body["bvh"] == "FAKE_BVH"
        else:
            assert "queue full" in body["error"]

    stats = _get(port, "/stats")
    assert stats["rejected_total"] == n_429
    assert stats["requests_total"] == n_ok  # 429s never reach the scheduler
    # queue drained and handler threads exited: no unbounded growth
    assert srv._queue.qsize() == 0
    time.sleep(0.5)
    assert threading.active_count() <= threads_before + 4


def test_429_b64_uploads_do_not_leak_files(slow_server):
    """A b64 burst against a full queue must not leave decoded upload files
    behind: every 429'd request's already-written WAV/BVH is unlinked before
    the reply (the backpressure path exists precisely to bound resources)."""
    import base64

    srv, port, clips = slow_server
    style_bvh, audio_wav = clips[0]
    payload = {
        "audio_wav_b64": base64.b64encode(audio_wav.read_bytes()).decode(),
        "styles": [{"bvh_b64": base64.b64encode(style_bvh.read_bytes()).decode()}],
    }

    results = [None] * 24

    def client(i):
        results[i] = _post_code(port, dict(payload, seed=i))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    codes = [c for c, _ in results]
    assert codes.count(429) >= 1, "burst of 24 into a 4-deep queue must overflow"
    assert codes.count(200) + codes.count(429) == len(codes), codes
    uploads = srv._tmp_root / "uploads"
    leftovers = list(uploads.glob("*")) if uploads.exists() else []
    assert not leftovers, f"429'd b64 uploads leaked: {leftovers}"


def test_429_carries_retry_after_header(slow_server):
    srv, port, clips = slow_server
    style_bvh, audio_wav = clips[0]
    payload = {"audio_path": str(audio_wav), "style_path": str(style_bvh)}
    # fill the queue while the scheduler sleeps, then one more must bounce
    headers = {}

    def client(i):
        try:
            _post(port, dict(payload, seed=i))
        except urllib.error.HTTPError as e:
            headers[i] = dict(e.headers)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bounced = [h for h in headers.values()]
    assert bounced, "expected at least one 429 out of 12-into-4"
    assert all(int(h.get("Retry-After", 0)) >= 1 for h in bounced)


def test_request_timeout_returns_504(tmp_path_factory):
    """A handler whose batch exceeds request_timeout_s must answer 504 and
    count in timeouts_total; the scheduler then skips the abandoned job and
    keeps serving."""
    import time

    root = tmp_path_factory.mktemp("timeout_serve")
    data_dir, net_dir, clips, opts = write_corpus(root, n_clips=1, nframes=120)
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    srv = GestureServer(pipe, max_batch=2, max_wait_ms=10,
                        request_timeout_s=0.3, drain_s=5.0)
    slow = {"sleep": 1.0}

    def fake_synthesize(jobs, batch_size=None):
        time.sleep(slow["sleep"])
        now = time.perf_counter()
        for j in jobs:
            j.bvh_text = "FAKE_BVH"
            j.t_done = now
            j.batch_size = batch_size or len(jobs)

    srv._synthesize = fake_synthesize
    port = srv.start()
    try:
        style_bvh, audio_wav = clips[0]
        payload = {"audio_path": str(audio_wav), "style_path": str(style_bvh)}
        code, body = _post_code(port, payload)
        assert code == 504 and "timed out" in body["error"]
        assert _get(port, "/stats")["timeouts_total"] == 1
        # server still alive and serving after the abandoned job
        slow["sleep"] = 0.0
        time.sleep(1.2)  # let the abandoned batch finish on the scheduler
        code, body = _post_code(port, payload)
        assert code == 200 and body["bvh"] == "FAKE_BVH"
    finally:
        srv.stop()


def test_b64_only_mode_rejects_paths_but_serves_uploads(tmp_path_factory, tmp_path):
    """allow_paths=False (the non-loopback default) must reject every path
    payload field with 400 while the b64 upload forms still synthesize."""
    root = tmp_path_factory.mktemp("b64_serve")
    data_dir, net_dir, clips, opts = write_corpus(root, n_clips=1, nframes=120)
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    srv = GestureServer(pipe, max_batch=4, max_wait_ms=10, allow_paths=False)
    port = srv.start()
    try:
        style_bvh, audio_wav = clips[0]
        audio_b64 = base64.b64encode(audio_wav.read_bytes()).decode()
        style_b64 = base64.b64encode(style_bvh.read_bytes()).decode()

        for payload in (
            {"audio_path": str(audio_wav), "style_path": str(style_bvh)},
            {"audio_wav_b64": audio_b64, "style_path": str(style_bvh)},
            {"audio_wav_b64": audio_b64, "styles": [{"bvh_path": str(style_bvh)}]},
            {"audio_wav_b64": audio_b64, "styles": [{"bvh_b64": style_b64}],
             "first_pose": str(style_bvh)},
        ):
            code, body = _post_code(port, payload)
            assert code == 400 and "disabled" in body["error"], payload

        code, body = _post_code(port, {
            "audio_wav_b64": audio_b64,
            "styles": [{"bvh_b64": style_b64}],
            "first_pose_bvh_b64": style_b64,
            "seed": 9,
        }, timeout=600)
        assert code == 200
        _check_bvh(body["bvh"], tmp_path, int(round(60 * 2.0)))
        # uploads are single-use: nothing left behind
        uploads = srv._tmp_root / "uploads"
        assert not any(uploads.glob("*")) if uploads.exists() else True
    finally:
        srv.stop()


def test_default_allow_paths_follows_bind_host(tmp_path_factory):
    root = tmp_path_factory.mktemp("bind_serve")
    data_dir, net_dir, clips, opts = write_corpus(root, n_clips=1, nframes=120)
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    loop = GestureServer(pipe, host="127.0.0.1")
    assert loop.allow_paths is True
    loop._httpd.server_close()
    public = GestureServer(pipe, host="0.0.0.0")
    assert public.allow_paths is False
    public._httpd.server_close()


def test_graceful_drain_on_stop(slow_server):
    """stop() must answer queued work (drain) and refuse new admissions,
    never leaving a client hanging."""
    import time

    srv, port, clips = slow_server
    style_bvh, audio_wav = clips[0]
    payload = {"audio_path": str(audio_wav), "style_path": str(style_bvh)}

    results = []
    threads = [
        threading.Thread(target=lambda i=i: results.append(
            _post_code(port, dict(payload, seed=i))))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    time.sleep(0.1)  # let them enqueue
    t_stop = threading.Thread(target=srv.stop)
    t_stop.start()
    for t in threads:
        t.join(timeout=15)
        assert not t.is_alive(), "client hung through graceful drain"
    t_stop.join(timeout=15)
    assert not t_stop.is_alive()
    for code, body in results:
        assert code in (200, 500, 503), (code, body)


def _post_path(port, path, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _decode_frames(f):
    assert f["dtype"] == "float32"
    return {k: np.frombuffer(base64.b64decode(v["b64"]), np.float32)
            .reshape(v["shape"]) for k, v in f["data"].items()}


def test_stream_http_matches_offline_session(server, tmp_path):
    """Live streaming over HTTP: start a session with a b64 style, push the
    audio in arbitrary chunks, finish with a BVH — the frames must be
    BIT-IDENTICAL to a direct StreamingSession on the same pipeline (which
    is itself proven identical to the offline rollout)."""
    srv, port, clips, root = server
    style_bvh, audio_wav = clips[0]
    from zeggs_tpu.io.wav import read_wavfile

    _, samples = read_wavfile(audio_wav, desired_fs=16000)
    samples = np.asarray(samples, np.float32)

    out = _post_path(port, "/stream/start", {
        "styles": [{"bvh_b64": base64.b64encode(style_bvh.read_bytes()).decode()}],
        "seed": 7, "quantum": 1,
    })
    sid = out["session_id"]
    chunks = [_decode_frames(out["frames"])]
    assert chunks[0]["root_pos"].shape[0] == 1  # frame 0 = first-pose state

    for part in np.array_split(samples, 3):
        r = _post_path(port, "/stream/push", {
            "session_id": sid,
            "audio_f32_b64": base64.b64encode(
                part.astype("<f4").tobytes()).decode(),
        })
        chunks.append(_decode_frames(r["frames"]))

    fin = _post_path(port, "/stream/finish", {"session_id": sid, "bvh": True})
    chunks.append(_decode_frames(fin["frames"]))
    assert fin["total_frames"] == 180
    _check_bvh(fin["bvh"], tmp_path, 180)
    got = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    assert got["root_pos"].shape[0] == 180

    # direct in-process session, same seed/style/chunking (different chunk
    # splits are only equal to ~2e-5 — distinct XLA programs fuse
    # differently; the HTTP layer itself must be bit-transparent)
    sess = srv.pipe.streaming_session([(style_bvh, None)], seed=7, quantum=1)
    direct = [sess._collect(0)]
    for part in np.array_split(samples, 3):
        direct.append(sess.push(part))
    direct.append(sess.finish())
    want = {k: np.concatenate([c[k] for c in direct]) for k in direct[0]}
    for k in want:
        assert np.array_equal(got[k], want[k]), k

    # the session is gone after finish
    code, body = _post_code_path(port, "/stream/push",
                                 {"session_id": sid, "audio_f32_b64": ""})
    assert code == 404


def _post_code_path(port, path, payload, timeout=60):
    try:
        return 200, _post_path(port, path, payload, timeout=timeout)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_stream_unknown_session_404_and_bad_start_400(server):
    _, port, _, _ = server
    code, _ = _post_code_path(port, "/stream/push",
                              {"session_id": "nope", "audio_f32_b64": ""})
    assert code == 404
    code, body = _post_code_path(port, "/stream/start", {"styles": []})
    assert code == 400
    code, _ = _post_code_path(port, "/stream/nonsense", {})
    assert code == 404


def test_stream_finish_empty_is_400_and_session_survives(server, tmp_path):
    """Finishing before any audio was pushed must answer 400 (client edge
    case, not a 500) and keep the session usable."""
    srv, port, clips, _ = server
    style_bvh, audio_wav = clips[0]
    from zeggs_tpu.io.wav import read_wavfile

    out = _post_path(port, "/stream/start", {
        "styles": [{"bvh_b64": base64.b64encode(
            style_bvh.read_bytes()).decode()}],
        "seed": 3, "quantum": 1,
    })
    sid = out["session_id"]
    code, body = _post_code_path(port, "/stream/finish",
                                 {"session_id": sid, "bvh": True})
    assert code == 400 and "no audio" in body["error"]
    # the session still works end to end
    _, samples = read_wavfile(audio_wav, desired_fs=16000)
    _post_path(port, "/stream/push", {
        "session_id": sid,
        "audio_f32_b64": base64.b64encode(
            np.asarray(samples, "<f4").tobytes()).decode(),
    })
    fin = _post_path(port, "/stream/finish", {"session_id": sid, "bvh": True})
    assert fin["total_frames"] == 180
    _check_bvh(fin["bvh"], tmp_path, 180)


def test_stream_max_sessions_429_is_counted(server):
    """The max_sessions bound answers 429 with Retry-After and shows up in
    /stats rejected_total, like every other rejection."""
    srv, port, clips, _ = server
    style_bvh, _ = clips[0]
    fresh = GestureServer(srv.pipe, max_batch=2, max_wait_ms=10,
                          max_sessions=1)
    fport = fresh.start()
    try:
        payload = {"styles": [{"bvh_b64": base64.b64encode(
            style_bvh.read_bytes()).decode()}]}
        _post_path(fport, "/stream/start", payload)
        rejected_before = _get(fport, "/stats")["rejected_total"]
        try:
            _post_path(fport, "/stream/start", payload)
            raise AssertionError("expected 429")
        except urllib.error.HTTPError as e:
            assert e.code == 429
            assert int(e.headers.get("Retry-After", 0)) >= 1
        assert _get(fport, "/stats")["rejected_total"] == rejected_before + 1
    finally:
        fresh.stop()


def test_stream_sessions_are_garbage_collected(server):
    """An idle session past session_ttl_s disappears (and /stats shows the
    live count); pushes to it answer 404 instead of leaking memory."""
    import time

    srv, port, clips, _ = server
    style_bvh, _ = clips[0]
    fresh = GestureServer(srv.pipe, max_batch=2, max_wait_ms=10,
                          session_ttl_s=0.3)
    fport = fresh.start()
    try:
        out = _post_path(fport, "/stream/start", {
            "styles": [{"bvh_b64": base64.b64encode(
                style_bvh.read_bytes()).decode()}],
        })
        sid = out["session_id"]
        assert _get(fport, "/stats")["live_sessions"] == 1
        time.sleep(1.2)  # > ttl + scheduler tick
        assert _get(fport, "/stats")["live_sessions"] == 0
        code, _ = _post_code_path(fport, "/stream/push",
                                  {"session_id": sid, "audio_f32_b64": ""})
        assert code == 404
    finally:
        fresh.stop()


def test_bad_request_does_not_fail_cobatched_neighbor(server, tmp_path):
    """A request whose style BVH is corrupt fails at synthesis time (it
    passes validation: the file exists); a valid request coalesced into
    the same batch must still succeed via the per-job retry."""
    _, port, clips, root = server
    style_bvh, audio_wav = clips[0]
    corrupt = root / "corrupt.bvh"
    corrupt.write_text("HIERARCHY\nnot a real bvh\n")

    results = {}

    def good():
        results["good"] = _post(port, {
            "audio_path": str(audio_wav), "style_path": str(style_bvh), "seed": 2,
        })

    def bad():
        try:
            results["bad"] = _post(port, {
                "audio_path": str(audio_wav), "style_path": str(corrupt), "seed": 2,
            })
        except urllib.error.HTTPError as e:
            results["bad"] = e.code

    threads = [threading.Thread(target=good), threading.Thread(target=bad)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["bad"] == 500
    _check_bvh(results["good"]["bvh"], tmp_path, int(round(60 * 3.0)))


def test_push_queued_behind_slow_batch_survives_gc(tmp_path_factory):
    """ADVICE r4 (medium): a /stream/push queued while a batch slower than
    session_ttl_s holds the scheduler must NOT see its session GC'd — the
    per-session queued-op counter makes GC skip it."""
    import time

    root = tmp_path_factory.mktemp("gc_race")
    data_dir, net_dir, clips, opts = write_corpus(root, n_clips=1, nframes=120)
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    srv = GestureServer(pipe, max_batch=2, max_wait_ms=10, session_ttl_s=0.5)

    def fake_synthesize(jobs, batch_size=None):
        time.sleep(1.2)  # > ttl: pre-fix, the waiting session got collected
        now = time.perf_counter()
        for j in jobs:
            j.bvh_text = "FAKE_BVH"
            j.t_done = now
            j.batch_size = batch_size or len(jobs)

    srv._synthesize = fake_synthesize
    port = srv.start()
    try:
        style_bvh, audio_wav = clips[0]
        out = _post_path(port, "/stream/start", {"styles": [
            {"bvh_b64": base64.b64encode(style_bvh.read_bytes()).decode()}]})
        sid = out["session_id"]
        t = threading.Thread(target=_post_code, args=(
            port, {"audio_path": str(audio_wav), "style_path": str(style_bvh)}))
        t.start()
        time.sleep(0.3)  # batch is on the scheduler; the push queues behind it
        chunk = np.zeros(1600, "<f4")
        code, r = _post_code_path(port, "/stream/push", {
            "session_id": sid,
            "audio_f32_b64": base64.b64encode(chunk.tobytes()).decode()})
        t.join()
        assert code == 200, r
        # with no ops queued the session still ages out normally
        time.sleep(1.2)
        assert _get(port, "/stats")["live_sessions"] == 0
    finally:
        srv.stop()


def test_body_beyond_cap_gets_413(server):
    """ADVICE r4: the client-declared Content-Length is bounded BEFORE any
    read/allocation, on /synthesize and /stream/* alike."""
    srv, _, clips, _ = server
    fresh = GestureServer(srv.pipe, max_batch=2, max_wait_ms=10,
                          max_body_bytes=1000)
    port = fresh.start()
    try:
        big = {"audio_wav_b64": "A" * 4000, "style_label": 0}
        code, body = _post_code(port, big)
        assert code == 413 and "body too large" in body["error"]
        code, body = _post_code_path(port, "/stream/push",
                                     {"session_id": "x", "pad": "A" * 4000})
        assert code == 413
        # under the cap still parses (and fails for a normal reason)
        code, body = _post_code(port, {"style_label": 0})
        assert code == 400

        # a NEGATIVE Content-Length must 400 immediately: without the guard
        # it turns rfile.read(-1) into read-until-EOF, bypassing the cap
        # (the handler would hang below instead of answering)
        import socket as _socket
        with _socket.create_connection(("127.0.0.1", port), timeout=5) as s:
            s.settimeout(5)
            s.sendall(b"POST /synthesize HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: -1\r\n\r\n{}")
            status = s.recv(64)
        assert b"400" in status.split(b"\r\n", 1)[0]
    finally:
        fresh.stop()


def test_stream_push_audio_length_bounded(server):
    """A single push longer than max_push_s of audio is a 400, not an
    arbitrary-size allocation feeding the session."""
    srv, _, clips, _ = server
    style_bvh, _ = clips[0]
    fresh = GestureServer(srv.pipe, max_batch=2, max_wait_ms=10,
                          max_push_s=0.01)  # 160 samples at 16 kHz
    port = fresh.start()
    try:
        out = _post_path(port, "/stream/start", {"styles": [
            {"bvh_b64": base64.b64encode(style_bvh.read_bytes()).decode()}]})
        sid = out["session_id"]
        chunk = np.zeros(16000, "<f4")
        code, body = _post_code_path(port, "/stream/push", {
            "session_id": sid,
            "audio_f32_b64": base64.b64encode(chunk.tobytes()).decode()})
        assert code == 400 and "push too long" in body["error"]
        # a within-bound push still works
        ok = _post_path(port, "/stream/push", {
            "session_id": sid,
            "audio_f32_b64": base64.b64encode(
                chunk[:100].tobytes()).decode()})
        assert "frames" in ok
    finally:
        fresh.stop()


def test_concurrent_streams_and_batches_under_load(tmp_path_factory):
    """VERDICT r4 item 5: many live /stream sessions progressing through the
    scheduler ALONGSIDE batch /synthesize jobs — every session must make
    fair progress to completion with exact frame accounting, batch jobs must
    all succeed, handler threads must drain, and idle sessions must be
    GC'd on TTL afterwards."""
    import time

    root = tmp_path_factory.mktemp("stream_load")
    data_dir, net_dir, clips, opts = write_corpus(root, n_clips=1, nframes=120)
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    srv = GestureServer(pipe, max_batch=4, max_wait_ms=10, max_sessions=8,
                        session_ttl_s=2.0)
    port = srv.start()
    style_bvh, audio_wav = clips[0]
    style_b64 = base64.b64encode(style_bvh.read_bytes()).decode()
    from zeggs_tpu.io.wav import read_wavfile

    _, samples = read_wavfile(audio_wav, desired_fs=16000)
    samples = np.asarray(samples, np.float32)  # 2 s = 120 frames

    n_streams, n_batch = 6, 6
    frames = [0] * n_streams
    stream_err = [None] * n_streams
    batch_codes = [None] * n_batch

    def stream_client(i):
        try:
            out = _post_path(port, "/stream/start",
                             {"styles": [{"bvh_b64": style_b64}],
                              "seed": i, "quantum": 4})
            sid = out["session_id"]
            frames[i] += out["frames"]["n"]
            for part in np.array_split(samples, 4):
                r = _post_path(port, "/stream/push", {
                    "session_id": sid,
                    "audio_f32_b64": base64.b64encode(
                        part.astype("<f4").tobytes()).decode()})
                frames[i] += r["frames"]["n"]
            fin = _post_path(port, "/stream/finish", {"session_id": sid})
            frames[i] += fin["frames"]["n"]
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            stream_err[i] = repr(e)

    def batch_client(i):
        code, _ = _post_code(port, {"audio_path": str(audio_wav),
                                    "style_path": str(style_bvh), "seed": i})
        batch_codes[i] = code

    try:
        threads = [threading.Thread(target=stream_client, args=(i,))
                   for i in range(n_streams)]
        threads += [threading.Thread(target=batch_client, args=(i,))
                    for i in range(n_batch)]
        n_threads_before = threading.active_count()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not any(t.is_alive() for t in threads), "a client starved"

        assert stream_err == [None] * n_streams
        # exact accounting: every session emitted exactly the offline count
        assert frames == [120] * n_streams
        assert batch_codes == [200] * n_batch
        # sessions were bounded during the run and the map drains on TTL
        assert len(srv._sessions) <= 8
        deadline = time.monotonic() + 10.0
        while srv._sessions and time.monotonic() < deadline:
            time.sleep(0.2)
        assert len(srv._sessions) == 0, "finished/idle sessions must be GC'd"
        # handler threads drained back to near baseline (no thread leak)
        time.sleep(0.5)
        assert threading.active_count() <= n_threads_before + 2
        snap = srv.stats.snapshot()
        assert snap["errors_total"] == 0 and snap["timeouts_total"] == 0
    finally:
        srv.stop()
