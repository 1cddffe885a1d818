"""End-to-end inference slice: synthetic corpus -> generate_gesture -> BVH."""

import numpy as np
import pytest

from zeggs_tpu.infer import GesturePipeline, generate_gesture
from zeggs_tpu.io import bvh
from tests.synthetic import write_corpus, LABELS


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
