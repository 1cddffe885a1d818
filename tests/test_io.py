"""BVH / WAV / checkpoint round-trip tests."""

from pathlib import Path
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


def test_trim_silence_semantics():
    fs = 16000
    rng = np.random.default_rng(0)
    tone = 0.5 * np.sin(2 * np.pi * 220 * np.arange(fs) / fs).astype(np.float32)
    x = np.concatenate([np.zeros(fs // 2, np.float32), tone, np.zeros(fs // 4, np.float32)])
    y = wav.trim_silence(x, fs, silence_threshold=0.1, min_silence_duration=0.01)
    buf = int(0.01 * fs)
    # head/tail silence removed but one min_silence_duration buffer kept
    # (+-4 samples: the tone's own zero-crossings at its edges)
    assert abs((len(x) - len(y)) - ((fs // 2 - buf) + (fs // 4 - buf))) <= 4
    assert np.abs(y).max() == np.abs(x).max()
    # all-silent input trims to empty
    assert len(wav.trim_silence(np.zeros(1000, np.float32), fs)) == 0


def test_reformat_and_trim_wav_file(tmp_path):
    """audio_files.py:10-85 semantics, no sox binary: trim + resample +
    bit depth/channels + 0.01 s silence pads, overwrite-in-place."""
    fs_in, fs_out = 44100, 16000
    t = np.arange(int(0.5 * fs_in)) / fs_in
    tone = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    x = np.concatenate([np.zeros(fs_in // 5, np.float32), tone, np.zeros(fs_in // 5, np.float32)])
    p = tmp_path / "clip.wav"
    wav.write_wavefile(p, x, fs_in)

    out = wav.reformat_and_trim_wav_file(p, fs_out, 16, 1, overwrite=True)
    assert out == str(p)
    fs2, y = wav.read_wavfile(p, rescale=True)
    assert fs2 == fs_out
    pad = int(0.01 * fs_out)
    # silence pads present at both ends
    assert np.abs(y[:pad]).max() < 1e-3 and np.abs(y[-pad:]).max() < 1e-3
    # duration ~= tone + buffers + pads, not the original silences
    expect = 0.5 + 2 * 0.01 + 2 * 0.01
    assert abs(len(y) / fs_out - expect) < 0.02
    assert np.abs(y).max() > 0.3

    # non-overwrite mode writes into processed_<fs>/
    wav.write_wavefile(p, x, fs_in)
    out2 = wav.reformat_and_trim_wav_file(p, fs_out, 16, 1, overwrite=False)
    assert Path(out2).parent.name == f"processed_{fs_out}" and Path(out2).exists()


def test_compute_stats_rejects_empty_training_ranges():
    import pytest

    from zeggs_tpu.data.pipeline import compute_stats

    processed = {"audio_features": np.zeros((100, 81), np.float32)}
    with pytest.raises(ValueError, match="no training frames"):
        compute_stats(processed, np.zeros((0, 2), np.int64))
