"""BVH / WAV / checkpoint round-trip tests."""

import numpy as np

from zeggs_tpu.io import bvh, checkpoint, wav
from tests.synthetic import make_motion, make_audio


def test_bvh_roundtrip(tmp_path):
    anim = make_motion(nframes=50)
    path = tmp_path / "test.bvh"
    bvh.save(path, anim)
    loaded = bvh.load(path)
    assert loaded["names"] == anim["names"]
    np.testing.assert_array_equal(loaded["parents"], anim["parents"])
    assert loaded["order"] == "zyx"
    # frametime is serialized at %f precision (6 decimals), like the reference
    assert abs(loaded["frametime"] - anim["frametime"]) < 1e-6
    np.testing.assert_allclose(loaded["rotations"], anim["rotations"], atol=1e-4)
    # root position round-trips; other joints' positions come from offsets
    np.testing.assert_allclose(loaded["positions"][:, 0], anim["positions"][:, 0], atol=1e-4)
    np.testing.assert_allclose(loaded["offsets"], anim["offsets"], atol=1e-4)


def test_bvh_frame_slicing(tmp_path):
    anim = make_motion(nframes=50)
    path = tmp_path / "test.bvh"
    bvh.save(path, anim)
    sliced = bvh.load(path, start=10, end=31)
    np.testing.assert_allclose(sliced["rotations"], anim["rotations"][10:30], atol=1e-4)


def test_bvh_translations_mode(tmp_path):
    anim = make_motion(nframes=10)
    anim["positions"] = anim["positions"] + np.random.default_rng(0).normal(
        size=anim["positions"].shape
    ).astype(np.float32)
    path = tmp_path / "t.bvh"
    bvh.save(path, anim, translations=True)
    loaded = bvh.load(path)
    np.testing.assert_allclose(loaded["positions"], anim["positions"], atol=1e-4)


def test_wav_roundtrip_int16(tmp_path):
    x = make_audio(0.5)
    path = tmp_path / "a.wav"
    wav.write_wavefile(path, x, 16000)
    fs, y = wav.read_wavfile(path, rescale=True, desired_fs=16000)
    assert fs == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_wav_resample(tmp_path):
    fs_in = 44100
    t = np.arange(int(0.5 * fs_in)) / fs_in
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "b.wav"
    wav.write_wavefile(path, x, fs_in)
    fs, y = wav.read_wavfile(path, rescale=True, desired_fs=16000)
    assert fs == 16000
    assert abs(len(y) - int(0.5 * 16000)) <= 2
    # spectral peak preserved at 440 Hz
    spec = np.abs(np.fft.rfft(y))
    freq = np.fft.rfftfreq(len(y), 1 / 16000)
    assert abs(freq[np.argmax(spec)] - 440) < 5


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "a": {"w": np.ones((3, 4), np.float32), "b": np.zeros(4)},
        "list": [np.arange(3), {"x": np.float32(2.0)}],
    }
    path = tmp_path / "ck.npz"
    checkpoint.save(path, tree, meta={"step": 7})
    loaded, meta = checkpoint.load(path)
    assert meta == {"step": 7}
    np.testing.assert_array_equal(loaded["a"]["w"], tree["a"]["w"])
    np.testing.assert_array_equal(loaded["list"][0], tree["list"][0])
    np.testing.assert_array_equal(loaded["list"][1]["x"], tree["list"][1]["x"])


def test_train_state_roundtrip(tmp_path):
    nets = {"speech_encoder": {"w": np.ones(3)}, "decoder": {"b": np.zeros(2)}}
    opt = {"mu": {"w": np.full(3, 0.5)}}
    checkpoint.save_train_state(tmp_path / "ck", 123, nets, opt, extra={"loss": 1.5})
    nets2, opt2, meta = checkpoint.load_train_state(tmp_path / "ck")
    assert meta["step"] == 123 and meta["loss"] == 1.5
    np.testing.assert_array_equal(nets2["speech_encoder"]["w"], nets["speech_encoder"]["w"])
    np.testing.assert_array_equal(opt2["mu"]["w"], opt["mu"]["w"])


def test_native_parser_matches_numpy():
    from zeggs_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    text = "1.5 -2.25 3e-2\n4 5.5 -6.125\n"
    out = native.parse_float_matrix(text)
    np.testing.assert_allclose(out, [[1.5, -2.25, 0.03], [4, 5.5, -6.125]], atol=1e-6)
    # formatter round-trips through the parser
    body = native.format_float_matrix(np.asarray(out, np.float32))
    out2 = native.parse_float_matrix(body)
    np.testing.assert_allclose(out2, out, atol=1e-6)
