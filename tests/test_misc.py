"""Tests: reference-checkpoint conversion (real .pt), Griffin-Lim, logs,
change_bvh, converter CLI."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from zeggs_tpu.io import bvh, checkpoint, torch_compat
from zeggs_tpu.models import speech_encoder
from zeggs_tpu.ops import mel
from zeggs_tpu.utils import change_bvh
from zeggs_tpu.utils.logs import ascii_table, percent_bar, progress, get_logger_from_arg
from tests.synthetic import make_motion

REF_PT = Path("/root/reference/data/outputs/v1/saved_models/speech_encoder.pt")


@pytest.mark.skipif(not REF_PT.exists(), reason="reference checkpoint unavailable")
def test_convert_real_speech_encoder_and_parity():
    """Convert the real pretrained speech_encoder.pt and verify our forward
    matches the unpickled torch module on the same input."""
    import torch

    sd = torch_compat.load_reference_module(REF_PT)
    params = torch_compat.convert_speech_encoder(sd)
    assert params["conv0"]["w"].shape == (1, 81, 64)
    assert params["conv1"]["w"].shape == (31, 64, 64)

    torch_compat._install_modules_shim()
    module = torch.load(REF_PT, map_location="cpu", weights_only=False)
    module.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 120, 81)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x).swapaxes(1, 2)
        h = torch.nn.functional.elu(module.layer0(xt))
        h = torch.nn.functional.elu(module.layer1(h))
        h = h.swapaxes(1, 2)
        ref = torch.nn.functional.elu(module.layer2(h)).numpy()

    ours = np.asarray(speech_encoder.apply(params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_convert_cli(tmp_path):
    if not REF_PT.exists():
        pytest.skip("reference checkpoint unavailable")
    from zeggs_tpu.cli.convert import main

    main(["--src", str(REF_PT.parent), "--dst", str(tmp_path)])
    loaded, meta = checkpoint.load(tmp_path / "speech_encoder.npz")
    assert "converted_from" in meta
    assert loaded["conv1"]["w"].shape == (31, 64, 64)


def test_griffin_lim_recovers_tone():
    """GL on the magnitude of a pure tone reconstructs a signal whose
    spectrum peaks at the same frequency."""
    fs, n_fft, hop = 16000, 800, 200
    t = np.arange(fs) / fs
    x = (0.5 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
    mag = np.asarray(
        mel.stft_magnitude(jnp.asarray(x), jnp.asarray(mel.hann_symmetric(n_fft)), n_fft, hop,
                           real_amplitude=False, centered=False)
    )
    y = np.asarray(mel.griffin_lim(mag, hop, n_fft, iterations=20))
    assert np.isfinite(y).all()
    spec = np.abs(np.fft.rfft(y))
    freq = np.fft.rfftfreq(len(y), 1 / fs)
    assert abs(freq[np.argmax(spec)] - 500) < 10


def test_mel_to_linear_roundtrip_shape():
    lin = np.abs(np.random.default_rng(0).normal(size=(12, 401))).astype(np.float32)
    m = lin @ mel.mel_filterbank(800, 16000, 80, 20, 7600, True).T
    back = np.asarray(mel.mel_to_linear(jnp.asarray(m), 16000, 800, 20, 7600))
    assert back.shape == (12, 401)
    assert np.isfinite(back).all()


def test_db_roundtrip():
    x = np.asarray(mel.db_to_amplitude(jnp.asarray([-20.0, 0.0, 6.0])))
    np.testing.assert_allclose(x, [0.1, 1.0, 10 ** 0.3], atol=1e-5)
    norm = jnp.asarray([0.0, 0.5, 1.0])
    denorm = np.asarray(mel.denormalize_range(norm, 1e-5))
    np.testing.assert_allclose(denorm, [-100.0, -50.0, 0.0], atol=1e-4)


def test_percent_bar_and_progress():
    assert percent_bar(1.0) == "#" * 30
    assert len(percent_bar(0.5)) == 30
    import datetime

    line = progress(1, 100, 5, 0.25, 50, datetime.datetime.now())
    assert "100" in line and "%" in line


def test_ascii_table():
    out = ascii_table(["a", "bb"], [[1, 2], [3, 4]], title="T")
    assert "| a | bb |" in out and out.startswith("T")


def test_logger_factory(tmp_path):
    log = get_logger_from_arg(None)
    log.info("hello")
    from zeggs_tpu.utils.logs import get_logger

    log2 = get_logger("filelog", log_file=tmp_path / "x.log", console=False)
    log2.warning("to file")
    for h in log2.handlers:
        h.flush()
    assert "to file" in (tmp_path / "x.log").read_text()


def test_change_bvh(tmp_path):
    anim = make_motion(60)
    src = tmp_path / "a.bvh"
    dst = tmp_path / "b.bvh"
    bvh.save(src, anim)
    change_bvh(str(src), str(dst), fps=30, center=True)
    out = bvh.load(dst)
    assert abs(out["frametime"] - 1 / 30) < 1e-6
    # centered: root starts at (x=0, z=0)
    assert abs(out["positions"][0, 0, 0]) < 1e-3
    assert abs(out["positions"][0, 0, 2]) < 1e-3


def test_compare_cli(tmp_path, capsys):
    from zeggs_tpu.cli.compare import compare_bvh, main

    anim = make_motion(40)
    a, b = tmp_path / "a.bvh", tmp_path / "b.bvh"
    bvh.save(a, anim)
    anim2 = dict(anim)
    anim2["rotations"] = anim["rotations"] + 0.5
    bvh.save(b, anim2)
    r = compare_bvh(str(a), str(a))
    assert r["comparable"] and r["rotation_mae_deg"] < 1e-5
    r2 = compare_bvh(str(a), str(b))
    assert abs(r2["rotation_mae_deg"] - 0.5) < 1e-3
    assert r2["joint_position_error_mean"] > 0
    main([str(a), str(b), "--json"])
    out = capsys.readouterr().out
    import json as _json

    assert _json.loads(out)["comparable"]


def test_queue_logger_drains(tmp_path):
    import queue

    from zeggs_tpu.utils.logs import QueueLogger, get_logger

    q = queue.Queue()
    proxy = QueueLogger(q)
    proxy.info("from worker")
    proxy.warning("careful")
    target = get_logger("drain_test", log_file=tmp_path / "d.log", console=False)
    proxy.drain(target)
    for h in target.handlers:
        h.flush()
    text = (tmp_path / "d.log").read_text()
    assert "from worker" in text and "careful" in text


def test_device_memory_stats():
    from zeggs_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()
    assert len(stats) >= 1
