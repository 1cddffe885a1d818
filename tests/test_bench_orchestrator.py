"""Unit tests for bench.py's orchestrator contract (VERDICT r3 item 1).

The driver parses the LAST JSON line bench.py printed when it was killed,
so the orchestrator must (a) emit a complete headline artifact immediately
after the core stage, (b) re-emit after every optional stage, (c) mark
stages skipped when the wall-clock budget runs out, and (d) never crash on
a malformed docs/full_run_curve.json (rewritten non-atomically by a
possibly-concurrent scripts/train_full.py). Stages are stubbed out — no
devices are touched.
"""

import importlib.util
import json
import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setitem(sys.modules, "bench", mod)
    spec.loader.exec_module(mod)
    return mod


CORE = {"platform": "tpu", "best_fps": 3_440_000.0, "fps8": 4_520_000.0,
        "lat_ms": 28.0, "lat8_ms": 10.4, "lat_cold_ms": 44.9,
        "lat_cold_p99_ms": 70.0}


def _emitted_lines(capsys):
    return [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]


def test_headline_emitted_before_optional_stages_and_skips_over_budget(
        bench, monkeypatch, capsys):
    """With a budget too small for any optional stage, the headline artifact
    still comes out complete and each stage is marked skipped_over_budget."""
    calls = []

    def fake_run_stage(argv, timeout, env=None):
        calls.append(argv)
        return dict(CORE)

    monkeypatch.setattr(bench, "_probe_tpu", lambda: True)
    monkeypatch.setattr(bench, "_run_stage", fake_run_stage)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("ZEGGS_BENCH_BUDGET_S", "5")  # core only
    bench.main()

    lines = _emitted_lines(capsys)
    assert len(calls) == 1, "only the core stage may run on a 5s budget"
    assert lines, "headline artifact must be emitted"
    first, last = lines[0], lines[-1]
    for artifact in (first, last):
        assert artifact["metric"] == "gesture_frames_per_sec_per_chip"
        assert artifact["value"] == CORE["best_fps"]
        assert artifact["vs_baseline"] == round(CORE["best_fps"] / 1200, 3)
        assert artifact["extra"]["b1_latency_10s_clip_ms"] == CORE["lat_ms"]
    # optional stages all present in the final line as explicit skips
    skipped = [k for k, v in last["extra"].items()
               if isinstance(v, dict) and v.get("skipped_over_budget")]
    assert set(skipped) == {"train", "train_bf16", "serve", "streaming"}


def test_stage_results_enrich_and_reemit(bench, monkeypatch, capsys):
    """Each optional stage's JSON is merged into extra and the artifact is
    re-printed after every stage (the driver reads the LAST line)."""
    def fake_run_stage(argv, timeout, env=None):
        if "--stage" in argv:
            return dict(CORE)
        return {"ran": Path(argv[0]).name}

    monkeypatch.setattr(bench, "_probe_tpu", lambda: True)
    monkeypatch.setattr(bench, "_run_stage", fake_run_stage)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("ZEGGS_BENCH_BUDGET_S", "100000")
    bench.main()

    lines = _emitted_lines(capsys)
    # 1 headline + one re-emit per optional stage
    assert len(lines) == 5
    last = lines[-1]
    assert last["extra"]["train"]["ran"] == "device_train_bench.py"
    assert last["extra"]["serve"]["ran"] == "bench_serve.py"
    assert last["extra"]["streaming"]["ran"] == "bench_streaming.py"
    # every completed stage records its measured wall cost for estimate tuning
    assert all("stage_wall_s" in last["extra"][k]
               for k in ("train", "serve", "streaming"))


def test_failed_optional_stage_never_kills_the_artifact(
        bench, monkeypatch, capsys):
    def fake_run_stage(argv, timeout, env=None):
        if "--stage" in argv:
            return dict(CORE)
        raise RuntimeError("stage exploded")

    monkeypatch.setattr(bench, "_probe_tpu", lambda: True)
    monkeypatch.setattr(bench, "_run_stage", fake_run_stage)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("ZEGGS_BENCH_BUDGET_S", "100000")
    bench.main()

    last = _emitted_lines(capsys)[-1]
    assert last["value"] == CORE["best_fps"]
    assert "stage exploded" in last["extra"]["train"]["failed"]


def test_core_timeout_falls_back_to_cpu_within_budget(
        bench, monkeypatch, capsys):
    """A TPU core stage that dies mid-run retries on CPU, and the first
    attempt's timeout leaves enough budget for that retry to fit."""
    attempts = []

    def fake_run_stage(argv, timeout, env=None):
        attempts.append((timeout, env))
        if env is None:
            raise RuntimeError("tunnel died")
        return dict(CORE, platform="cpu")

    monkeypatch.setattr(bench, "_probe_tpu", lambda: True)
    monkeypatch.setattr(bench, "_run_stage", fake_run_stage)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("ZEGGS_BENCH_BUDGET_S", "1140")
    bench.main()

    assert len(attempts) == 2
    t_first, env_first = attempts[0]
    t_retry, env_retry = attempts[1]
    assert env_first is None and env_retry == {"JAX_PLATFORMS": "cpu"}
    # the first attempt must reserve room for a retry: after it consumes its
    # full timeout, >= 360s of the budget remains for the CPU pass (the
    # stubbed stage returns instantly, so assert on the reservation itself)
    assert t_first <= 1140 - 360, t_first
    last = _emitted_lines(capsys)[-1]
    assert last["extra"]["platform"] == "cpu"
    # optional TPU-only stages must not run on the CPU fallback
    assert "train" not in last["extra"]


def test_full_run_summary_tolerates_malformed_curve(bench, monkeypatch, tmp_path):
    """_full_run_summary must degrade to None on ANY malformed content —
    a crash here would kill bench before the first _emit."""
    f = tmp_path / "full_run_curve.json"
    monkeypatch.setattr(bench, "_REPO", str(tmp_path.parent))
    cases = [
        "not json at all",
        "[1, 2, 3]",                      # non-dict top level
        '{"wall_s": null, "total_loss": [1.0]}',  # float(None) -> TypeError
        '{"total_loss": "oops"}',
    ]
    docs = tmp_path.parent / "docs"
    docs.mkdir(exist_ok=True)
    target = docs / "full_run_curve.json"
    for content in cases:
        target.write_text(content)
        assert bench._full_run_summary() is None, content
    # and a well-formed file summarizes
    target.write_text(json.dumps({
        "iters_done": 160000, "iters_target": 160000, "completed": True,
        "dtype": "bfloat16", "wall_s": 7200.0, "iters_per_s": 22.2,
        "total_loss": [5.4, 0.05],
    }))
    s = bench._full_run_summary()
    assert s["completed"] is True and s["wall_h"] == 2.0
    assert s["loss_start"] == 5.4 and s["loss_final"] == 0.05


def test_runaway_stage_costs_at_most_itself(bench, monkeypatch, capsys):
    """VERDICT r4 item 3: a stage that overruns its granted budget mid-
    flight (subprocess timeout fires) is recorded as failed, and every
    LATER stage still runs while budget remains — serve's round-4 overrun
    must never again take streaming down with it."""
    import subprocess

    clock = [1000.0]
    monkeypatch.setattr(bench.time, "time", lambda: clock[0])

    stage_log = []

    def fake_run_stage(argv, timeout, env=None):
        if "--stage" in argv:
            clock[0] += 200.0  # core consumes 200s
            return dict(CORE)
        name = Path(argv[0]).name
        if name == "bench_serve.py":
            # runaway: consume the ENTIRE subprocess timeout, then die the
            # way subprocess.run does
            stage_log.append((name, argv, timeout))
            clock[0] += timeout
            raise subprocess.TimeoutExpired(argv, timeout)
        stage_log.append((name, argv, timeout))
        clock[0] += 30.0
        return {"ran": name}

    monkeypatch.setattr(bench, "_probe_tpu", lambda: True)
    monkeypatch.setattr(bench, "_run_stage", fake_run_stage)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("ZEGGS_BENCH_BUDGET_S", "1140")
    bench.main()

    last = _emitted_lines(capsys)[-1]
    # serve failed but is RECORDED (not silently missing)
    assert "failed" in last["extra"]["serve"]
    # serve's grant reserved the later stages' estimates: its timeout must
    # be far below the naive remaining-budget clamp (940-20 = 920s)
    serve_timeout = next(t for n, a, t in stage_log if n == "bench_serve.py")
    assert serve_timeout <= 400, serve_timeout
    # and the --budget passed to bench_serve leaves the watchdog headroom
    serve_argv = next(a for n, a, t in stage_log if n == "bench_serve.py")
    budget_val = float(serve_argv[serve_argv.index("--budget") + 1])
    assert budget_val + 5 < serve_timeout
    # every later stage still ran
    assert last["extra"]["streaming"]["ran"] == "bench_streaming.py"
    assert last["extra"]["train"]["ran"] == "device_train_bench.py"
    assert last["extra"]["train_bf16"]["ran"] == "device_train_bench.py"


def test_bench_serve_watchdog_emits_json_under_hard_budget(tmp_path):
    """bench_serve must print a parseable JSON line and exit 0 even when its
    budget expires inside an unpreemptible phase (cold compile): the
    watchdog thread is the backstop. Run as a real subprocess on CPU with a
    budget far below any cold-compile time."""
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "bench_serve.py"),
         "--requests", "2", "--budget", "8",
         "--root", str(tmp_path / "sb")],
        capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, proc.stdout
    out = json.loads(lines[-1])
    # either it finished unbelievably fast (warm cache) or the watchdog cut
    # it — both must yield a well-formed artifact line
    assert out.get("phase") == "done" or out.get("watchdog_fired") is True
