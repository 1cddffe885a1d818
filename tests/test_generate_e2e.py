"""End-to-end inference slice: synthetic corpus -> generate_gesture -> BVH."""

import numpy as np
import pytest

from zeggs_tpu.infer import GesturePipeline, generate_gesture
from zeggs_tpu.io import bvh
from tests.synthetic import write_corpus, LABELS

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return write_corpus(root, n_clips=2, nframes=180)


def test_generate_single_pair(corpus):
    data_dir, net_dir, clips, opts = corpus
    style_bvh, audio_wav = clips[0]
    results = data_dir.parent / "results"
    enc = generate_gesture(
        audio_file=audio_wav,
        styles=[(style_bvh, None)],
        network_path=net_dir,
        data_path=data_dir,
        results_path=results,
        temperature=1.0,
        seed=1234,
        pipeline=GesturePipeline(net_dir, data_dir, options=opts),
    )
    assert enc.shape == (1, opts.net.style_encoder.style_encoding_size)
    out = list(results.glob("*.bvh"))
    assert len(out) == 1
    anim = bvh.load(out[0])
    n_expected = int(round(60 * 3.0))
    assert anim["rotations"].shape[0] == n_expected
    assert np.isfinite(anim["rotations"]).all()
    assert (results / (out[0].stem + ".wav")).exists()


def test_generate_is_seed_deterministic(corpus):
    data_dir, net_dir, clips, opts = corpus
    style_bvh, audio_wav = clips[0]
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    r1 = data_dir.parent / "r1"
    r2 = data_dir.parent / "r2"
    for r in (r1, r2):
        generate_gesture(
            audio_file=audio_wav, styles=[(style_bvh, None)], network_path=net_dir,
            data_path=data_dir, results_path=r, seed=7, file_name="x", pipeline=pipe,
        )
    a1 = bvh.load(next(r1.glob("*.bvh")))
    a2 = bvh.load(next(r2.glob("*.bvh")))
    np.testing.assert_allclose(a1["rotations"], a2["rotations"], atol=1e-5)


def test_generate_blend_add(corpus):
    data_dir, net_dir, clips, opts = corpus
    results = data_dir.parent / "blend"
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    enc = generate_gesture(
        audio_file=clips[0][1],
        styles=[(clips[0][0], None), (clips[1][0], None)],
        network_path=net_dir,
        data_path=data_dir,
        results_path=results,
        blend_type="add",
        blend_ratio=[0.3, 0.7],
        file_name="blended",
        pipeline=pipe,
    )
    assert enc.shape == (1, opts.net.style_encoder.style_encoding_size)
    assert (results / "blended.bvh").exists()


def test_generate_stitch(corpus):
    data_dir, net_dir, clips, opts = corpus
    results = data_dir.parent / "stitch"
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    enc = generate_gesture(
        audio_file=clips[0][1],
        styles=[(clips[0][0], None), (clips[1][0], None)],
        network_path=net_dir,
        data_path=data_dir,
        results_path=results,
        blend_type="stitch",
        blend_ratio=[0.5, 0.5],
        file_name="stitched",
        pipeline=pipe,
    )
    # stitch returns per-frame encodings
    assert enc.ndim == 3
    assert (results / "stitched.bvh").exists()


def test_generate_style_frames_and_first_pose(corpus):
    data_dir, net_dir, clips, opts = corpus
    results = data_dir.parent / "fp"
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    generate_gesture(
        audio_file=clips[0][1],
        styles=[(clips[1][0], (20, 100))],
        network_path=net_dir,
        data_path=data_dir,
        results_path=results,
        first_pose=clips[0][0],
        file_name="fp",
        pipeline=pipe,
    )
    assert (results / "fp.bvh").exists()


def test_generate_embedding_only(corpus):
    """audio=None -> returns embeddings without writing results."""
    data_dir, net_dir, clips, opts = corpus
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    enc = generate_gesture(
        audio_file=None,
        styles=[(clips[0][0], None)],
        network_path=net_dir,
        data_path=data_dir,
        results_path=None,
        pipeline=pipe,
    )
    assert enc.shape == (1, opts.net.style_encoder.style_encoding_size)


def test_generate_raw_embedding_style(corpus):
    data_dir, net_dir, clips, opts = corpus
    results = data_dir.parent / "raw"
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    C = opts.net.style_encoder.style_encoding_size
    raw = np.random.default_rng(0).normal(size=(C,)).astype(np.float32)
    generate_gesture(
        audio_file=clips[0][1],
        styles=[(raw, "rawstyle")],
        network_path=net_dir,
        data_path=data_dir,
        results_path=results,
        first_pose=clips[0][0],
        file_name="raw",
        pipeline=pipe,
    )
    assert (results / "raw.bvh").exists()


def test_generate_label_mode(corpus):
    """Label-based style encoding (v2-model path): one-hot style +
    mandatory first_pose."""
    data_dir, net_dir, clips, opts = corpus
    import jax
    from zeggs_tpu.io import checkpoint
    from zeggs_tpu.models import decoder as dec_mod
    from tests.synthetic import LABELS, POSE_IN, POSE_OUT

    # decoder trained with style size = nlabels
    label_net = data_dir.parent / "label_models"
    label_net.mkdir(exist_ok=True)
    key = jax.random.PRNGKey(4)
    checkpoint.save(
        label_net / "decoder.npz",
        dec_mod.init(key, POSE_IN, POSE_OUT, opts.net.speech_encoder.speech_encoding_size,
                     len(LABELS), opts.net.decoder.nhidden, 2),
    )
    import shutil

    # reuse the speech encoder from the example-based corpus
    shutil.copy(net_dir / "speech_encoder.npz", label_net / "speech_encoder.npz")

    results = data_dir.parent / "label_results"
    pipe = GesturePipeline(label_net, data_dir, options=opts, style_encoding_type="label")
    enc = generate_gesture(
        audio_file=clips[0][1],
        styles=["Happy"],
        network_path=label_net,
        data_path=data_dir,
        results_path=results,
        style_encoding_type="label",
        first_pose=clips[0][0],
        file_name="label_out",
        pipeline=pipe,
    )
    assert enc.shape == (1, len(LABELS))
    assert float(np.asarray(enc)[0, LABELS.index("Happy")]) == 1.0
    anim = bvh.load(results / "label_out.bvh")
    assert np.isfinite(anim["rotations"]).all()
