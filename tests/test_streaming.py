"""Streaming session == offline generate_gesture on the same audio.

The StreamingSession (infer/streaming.py) must emit exactly the frames the
offline path produces, for ANY split of the audio into push() chunks:
the STFT head/tail padding, the mel->60 fps resample clipping, the k=31
conv replicate lookahead, and the decoder scan chunking all have to line
up. These tests drive both paths on a synthetic corpus with shared random
weights.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.synthetic import small_options, write_raw_corpus
from zeggs_tpu import config as C
from zeggs_tpu.data.pipeline import data_pipeline
from zeggs_tpu.infer.generate import GesturePipeline, generate_gesture
from zeggs_tpu.io import checkpoint
from zeggs_tpu.models import decoder as dec_mod
from zeggs_tpu.train.loop import init_networks

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_corpus")
    write_raw_corpus(root, n_clips=3, seconds=4.0)
    conf = C.PipelineConfig(
        base_path=str(root), processed_data_path="processed",
        info_filename="info.csv",
        audio_conf=C.MelConfig(normalize_loudness=False), len_ratios=(1.0,),
        save_trimmed_audio=False, save_trimmed_animation=False,
    )
    data_pipeline(conf)
    return root


@pytest.fixture(scope="module")
def pipe(corpus, tmp_path_factory):
    """Full pipeline over random small-model weights."""
    opts = small_options()
    models = tmp_path_factory.mktemp("stream_models")
    key = jax.random.PRNGKey(3)
    dd = json.loads((corpus / "processed" / "data_definition.json").read_text())
    njoints = len(dd["bone_names"])
    dims = dict(
        num_audio_features=81,
        pose_input_size=6 + njoints * 15 + 3,
        pose_output_size=6 + njoints * 15,
    )
    params = init_networks(key, opts, dims, nlabels=len(dd["label_names"]))
    for name in ("speech_encoder", "decoder", "style_encoder"):
        checkpoint.save(models / f"{name}.npz", params[name])
    return GesturePipeline(models, corpus / "processed", options=opts)


def _read_audio(pipe, corpus):
    from zeggs_tpu.io import wav

    _, audio = wav.read_wavfile(
        corpus / "original" / "000_Synth_0.wav", rescale=True,
        desired_fs=pipe.mel_cfg.sampling_rate, out_type="float32",
    )
    return np.asarray(audio, np.float32)


def _offline(pipe, corpus, tmp_path, styles, **kw):
    out = tmp_path / "offline"
    out.mkdir(exist_ok=True)
    generate_gesture(
        corpus / "original" / "000_Synth_0.wav", styles,
        network_path=None, data_path=None, results_path=out,
        file_name="off", pipeline=pipe, **kw,
    )
    from zeggs_tpu.io import bvh

    return bvh.load(out / "off.bvh")


def _stream(pipe, audio, styles, chunks, tmp_path, **kw):
    sess = pipe.streaming_session(styles, **kw)
    emitted = 1  # frame 0 comes out at construction
    o = 0
    for n in chunks:
        new = sess.push(audio[o : o + n])
        emitted += new["root_pos"].shape[0]
        o += n
    assert o >= len(audio)
    tail = sess.finish()
    emitted += tail["root_pos"].shape[0]
    assert emitted == sess.frames_emitted
    out = tmp_path / "stream"
    p = sess.write_bvh(out, "str")
    from zeggs_tpu.io import bvh

    return bvh.load(p), sess


def _chunk_plan(total, rng, kind):
    if kind == "whole":
        return [total]
    if kind == "seconds":
        n, out = 0, []
        while n < total:
            c = min(16000, total - n)
            out.append(c)
            n += c
        return out
    # random small/large mix, including tiny 7-sample pushes
    out, n = [], 0
    while n < total:
        c = int(rng.choice([7, 800, 3001, 16000, 40000]))
        c = min(c, total - n)
        out.append(c)
        n += c
    return out


@pytest.mark.parametrize("kind", ["whole", "seconds", "random"])
def test_streaming_matches_offline(pipe, corpus, tmp_path, kind):
    audio = _read_audio(pipe, corpus)
    styles = [(corpus / "original" / "001_Synth_1.bvh", (10, 80))]
    kw = dict(temperature=1.0, seed=77)

    ref = _offline(pipe, corpus, tmp_path, styles, **kw)
    if kind == "seconds":
        kw["quantum"] = 16  # batched-dispatch mode must emit identical frames
    got, sess = _stream(
        pipe, audio, styles, _chunk_plan(len(audio), np.random.default_rng(kind == "random" and 5 or 0), kind),
        tmp_path, **kw,
    )

    assert ref["rotations"].shape == got["rotations"].shape
    pos_mae = float(np.mean(np.abs(ref["positions"] - got["positions"])))
    rot_mae = float(np.mean(np.abs(ref["rotations"] - got["rotations"])))
    assert np.isfinite(got["positions"]).all()
    print(f"\nstreaming[{kind}]: pos MAE {pos_mae:.2e}, rot(deg) MAE {rot_mae:.2e}, "
          f"{sess.frames_emitted} frames")
    assert pos_mae < 1e-4, pos_mae
    assert rot_mae < 1e-3, rot_mae


def test_streaming_emits_before_finish(pipe, corpus):
    """Frames flow DURING the stream: after ~1.5 s of audio, more than a
    second of gesture is already out (0.3 s algorithmic lag documented in
    infer/streaming.py)."""
    audio = _read_audio(pipe, corpus)
    styles = [(corpus / "original" / "002_Synth_2.bvh", (0, 60))]
    sess = pipe.streaming_session(styles, temperature=1.0, seed=1)
    new = sess.push(audio[: 24000])
    assert sess.frames_emitted >= 60, sess.frames_emitted
    assert new["root_pos"].shape[0] >= 59
    sess.push(audio[24000:])
    sess.finish()
    n_frames = int(round(60.0 * len(audio) / pipe.mel_cfg.sampling_rate))
    assert sess.frames_emitted == n_frames


def test_streaming_blend_and_first_pose(pipe, corpus, tmp_path):
    """Two-style 'add' blend + explicit first_pose matches offline."""
    audio = _read_audio(pipe, corpus)
    styles = [
        (corpus / "original" / "001_Synth_1.bvh", (10, 80)),
        (corpus / "original" / "002_Synth_2.bvh", (0, 60)),
    ]
    kw = dict(temperature=1.0, seed=9, blend_ratio=(0.25, 0.75),
              first_pose=corpus / "original" / "000_Synth_0.bvh")
    ref = _offline(pipe, corpus, tmp_path, styles, blend_type="add", **kw)
    got, _ = _stream(pipe, audio, styles, [len(audio)], tmp_path, **kw)
    assert ref["rotations"].shape == got["rotations"].shape
    assert float(np.mean(np.abs(ref["positions"] - got["positions"]))) < 1e-4


def test_rollout_chunking_is_exact(pipe):
    """decoder.rollout == init_carry + chained rollout_chunk calls."""
    rng = np.random.default_rng(0)
    params = pipe.networks["decoder"]
    J = pipe.njoints
    T = 33
    B = 2
    state = dict(
        root_pos=rng.normal(size=(B, 3)), root_rot=np.tile([1.0, 0, 0, 0], (B, 1)),
        root_vel=rng.normal(size=(B, 3)), root_vrt=rng.normal(size=(B, 3)),
        lpos=rng.normal(size=(B, J, 3)), ltxy=np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]]), (B, J, 1, 1)),
        lvel=rng.normal(size=(B, J, 3)), lvrt=rng.normal(size=(B, J, 3)),
    )
    state = {k: jnp.asarray(v, jnp.float32) for k, v in state.items()}
    gaze = jnp.asarray(rng.normal(size=(B, T, 3)), jnp.float32)
    S = pipe.opts.net.speech_encoder.speech_encoding_size
    Cs = pipe.opts.net.style_encoder.style_encoding_size
    speech = jnp.asarray(rng.normal(size=(B, T, S)), jnp.float32)
    style = jnp.asarray(rng.normal(size=(B, T, Cs)), jnp.float32)
    stats = pipe.stats
    args = (stats["anim_input_mean"], stats["anim_input_std"],
            stats["anim_output_mean"], stats["anim_output_std"], pipe.dt)

    full = dec_mod.rollout(params, *state.values(), gaze, speech, style, *args)

    carry = dec_mod.init_carry(params, *state.values(), gaze[:, 0], style[:, 0],
                               stats["anim_input_mean"], stats["anim_input_std"])
    outs = []
    o = 1
    for n in (5, 1, 20, 6):  # 32 steps total = T-1
        carry, ys = dec_mod.rollout_chunk(
            params, carry, gaze[:, o : o + n], speech[:, o : o + n],
            style[:, o : o + n], *args,
        )
        outs.append(ys)
        o += n
    assert o == T
    for i in range(8):
        chunked = jnp.concatenate([y[i] for y in outs], axis=1)
        np.testing.assert_allclose(
            np.asarray(full[i][:, 1:]), np.asarray(chunked), rtol=2e-5, atol=2e-6,
        )


def test_batched_dispatch_mode_bounds_program_set(pipe, corpus, tmp_path):
    """quantum >= 16 (the serving default) must run a whole session on a
    BOUNDED device-program set — mel {32, 8(+128 for bulk)}, speech {16},
    decoder {16} — with finish tails pad-and-sliced through the same
    programs instead of compiling 4/2/1-row buckets (each extra program
    costs minutes cold through a remote-compile tunnel)."""
    audio = _read_audio(pipe, corpus)
    styles = [(corpus / "original" / "001_Synth_1.bvh", (10, 80))]
    pipe._stream_fn_cache = {}  # isolate from earlier sessions' programs
    # 0.5 s pushes: small enough that some pushes emit NOTHING under the
    # grain gating (regression: an empty speech emit must be None, not a
    # zero-width array that poisons the session's speech-row buffer)
    chunks = [8000] * (len(audio) // 8000) + ([len(audio) % 8000] or [])
    chunks = [c for c in chunks if c]
    got, sess = _stream(pipe, audio, styles, chunks, tmp_path, quantum=16)
    assert np.isfinite(got["rotations"]).all()
    mel_ns = {k[1] for k in pipe._stream_fn_cache if k[0] == "mel"}
    sp_ns = {k[1] for k in pipe._stream_fn_cache if k[0] == "speech"}
    dec_ns = {k[1] for k in pipe._stream_fn_cache if k[0] == "dec"}
    assert mel_ns <= {512, 128, 32, 8}, mel_ns
    assert min(mel_ns) >= 8, mel_ns
    assert sp_ns <= {256, 64, 16} and min(sp_ns) >= 16, sp_ns
    assert dec_ns <= {256, 64, 16} and min(dec_ns) >= 16, dec_ns
    # ... and the padded tails still emit the exact offline frame count
    n_frames = int(round(60.0 * len(audio) / pipe.mel_cfg.sampling_rate))
    assert sess.frames_emitted == n_frames
