"""Batched serving path: bucketed batched rollouts == per-clip generation."""

import numpy as np
import pytest

import jax

from zeggs_tpu.infer import GesturePipeline, generate_gesture
from zeggs_tpu.infer.batch import Request, generate_batch
from zeggs_tpu.io import bvh
from zeggs_tpu.parallel import create_mesh
from tests.synthetic import write_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("batch_corpus")
    return write_corpus(root, n_clips=3, nframes=150)


def test_generate_batch_writes_all(corpus):
    data_dir, net_dir, clips, opts = corpus
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    results = data_dir.parent / "batch_results"
    reqs = [
        Request(
            audio=clips[i][1],
            styles=[(clips[(i + 1) % 3][0], None)],
            file_name=f"batch_{i}",
            temperature=0.0,
            seed=i,
        )
        for i in range(3)
    ]
    written = generate_batch(pipe, reqs, results, bucket=64, max_batch=2)
    assert len(written) == 3
    for i in range(3):
        anim = bvh.load(results / f"batch_{i}.bvh")
        assert anim["rotations"].shape[0] == 150  # true length, padding sliced
        assert np.isfinite(anim["rotations"]).all()
        assert (results / f"batch_{i}.wav").exists()


def test_generate_batch_matches_single(corpus):
    """Batched rollout must equal the single-clip path frame for frame
    (temperature 0 -> deterministic)."""
    data_dir, net_dir, clips, opts = corpus
    pipe = GesturePipeline(net_dir, data_dir, options=opts)

    single_dir = data_dir.parent / "single_ref"
    generate_gesture(
        audio_file=clips[0][1], styles=[(clips[1][0], None)],
        network_path=net_dir, data_path=data_dir, results_path=single_dir,
        temperature=0.0, seed=5, file_name="ref", pipeline=pipe,
    )
    batch_dir = data_dir.parent / "batch_cmp"
    generate_batch(
        pipe,
        [Request(audio=clips[0][1], styles=[(clips[1][0], None)],
                 file_name="ref", temperature=0.0, seed=5)],
        batch_dir, bucket=64,
    )
    a = bvh.load(single_dir / "ref.bvh")
    b = bvh.load(batch_dir / "ref.bvh")
    np.testing.assert_allclose(a["rotations"], b["rotations"], atol=2e-3)
    np.testing.assert_allclose(a["positions"], b["positions"], atol=2e-3)


def test_generate_batch_sharded_over_mesh(corpus):
    data_dir, net_dir, clips, opts = corpus
    mesh = create_mesh(4)
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    results = data_dir.parent / "mesh_results"
    reqs = [
        Request(audio=clips[i % 3][1], styles=[(clips[i % 3][0], None)],
                file_name=f"m{i}", temperature=0.0, seed=i)
        for i in range(5)
    ]
    written = generate_batch(pipe, reqs, results, bucket=64, max_batch=8, mesh=mesh)
    assert len(written) == 5
    for i in range(5):
        anim = bvh.load(results / f"m{i}.bvh")
        assert np.isfinite(anim["rotations"]).all()


def test_generate_batch_stitch_matches_single(corpus):
    """Stitch transitions in the batched path == single-clip stitch path."""
    data_dir, net_dir, clips, opts = corpus
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    styles = [(clips[0][0], None), (clips[1][0], None)]

    single_dir = data_dir.parent / "stitch_single"
    generate_gesture(
        audio_file=clips[2][1], styles=styles, network_path=net_dir,
        data_path=data_dir, results_path=single_dir, blend_type="stitch",
        blend_ratio=[0.5, 0.5], temperature=0.0, seed=3, file_name="st",
        first_pose=clips[0][0], pipeline=pipe,
    )
    batch_dir = data_dir.parent / "stitch_batch"
    generate_batch(
        pipe,
        [Request(audio=clips[2][1], styles=styles, file_name="st",
                 temperature=0.0, seed=3, blend_type="stitch",
                 blend_ratio=[0.5, 0.5], first_pose=clips[0][0])],
        batch_dir, bucket=64,
    )
    a = bvh.load(single_dir / "st.bvh")
    b = bvh.load(batch_dir / "st.bvh")
    np.testing.assert_allclose(a["rotations"], b["rotations"], atol=2e-3)


def test_generate_batch_pipelined_many_chunks(corpus):
    """More chunks than the dispatch pipeline depth: mid-loop collection
    (copy_to_host_async + deferred device_get) must still write every clip
    identically to the small-chunk path."""
    data_dir, net_dir, clips, opts = corpus
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    results = data_dir.parent / "pipelined_results"
    reqs = [
        Request(
            audio=clips[i % 3][1],
            styles=[(clips[(i + 1) % 3][0], None)],
            file_name=f"pipe_{i}",
            temperature=0.0,
            seed=i,
        )
        for i in range(5)
    ]
    # max_batch=1 -> 5 chunks > pipeline_depth (2)
    written = generate_batch(pipe, reqs, results, bucket=64, max_batch=1)
    assert len(written) == 5
    ref = bvh.load(results / "pipe_0.bvh")
    dup = bvh.load(results / "pipe_3.bvh")  # same audio+style+temp, diff seed? seed differs
    for i in range(5):
        anim = bvh.load(results / f"pipe_{i}.bvh")
        assert anim["rotations"].shape[0] == 150
        assert np.isfinite(anim["rotations"]).all()
    # identical request content except seed: deterministic temperature=0 ->
    # byte-identical motion (seed only affects stochastic style sampling)
    np.testing.assert_allclose(ref["rotations"], dup["rotations"], atol=1e-4)


def test_generate_batch_matches_single_stochastic(corpus):
    """Stochastic style sampling (temperature > 0): the batched style
    encoder must reproduce the single path's per-request eps draws bit for
    bit, so batch == single even with VAE sampling on."""
    data_dir, net_dir, clips, opts = corpus
    pipe = GesturePipeline(net_dir, data_dir, options=opts)

    single_dir = data_dir.parent / "single_stoch"
    generate_gesture(
        audio_file=clips[0][1], styles=[(clips[1][0], None)],
        network_path=net_dir, data_path=data_dir, results_path=single_dir,
        temperature=0.7, seed=11, file_name="st", pipeline=pipe,
    )
    batch_dir = data_dir.parent / "batch_stoch"
    generate_batch(
        pipe,
        [Request(audio=clips[0][1], styles=[(clips[1][0], None)],
                 file_name="st", temperature=0.7, seed=11)],
        batch_dir, bucket=64,
    )
    a = bvh.load(single_dir / "st.bvh")
    b = bvh.load(batch_dir / "st.bvh")
    np.testing.assert_allclose(a["rotations"], b["rotations"], atol=2e-3)
    np.testing.assert_allclose(a["positions"], b["positions"], atol=2e-3)


def test_generate_batch_f16_transfer(corpus, monkeypatch):
    """ZEGGS_TRANSFER_DTYPE=float16 halves device->host bytes; outputs
    must track the fp32-transfer path within fp16 noise."""
    data_dir, net_dir, clips, opts = corpus
    req = Request(audio=clips[0][1], styles=[(clips[1][0], None)],
                  file_name="f16", temperature=0.0, seed=5)
    out32 = data_dir.parent / "f32_ref_results"
    generate_batch(GesturePipeline(net_dir, data_dir, options=opts), [req], out32, bucket=64)

    monkeypatch.setenv("ZEGGS_TRANSFER_DTYPE", "float16")
    pipe16 = GesturePipeline(net_dir, data_dir, options=opts)
    out16 = data_dir.parent / "f16_results"
    generate_batch(pipe16, [req], out16, bucket=64)
    a = bvh.load(out32 / "f16.bvh")  # fp32-transfer reference
    b = bvh.load(out16 / "f16.bvh")
    # fp16 mantissa ~1e-3 relative; compare angles modulo 360 (an epsilon
    # across the +-180 seam prints as a ~360 deg jump), and allow a few
    # degrees worst-case — Euler conversion amplifies quat noise near
    # gimbal configurations (typical error is ~0.01 deg)
    dr = (np.asarray(a["rotations"]) - np.asarray(b["rotations"]) + 180.0) % 360.0 - 180.0
    assert np.abs(dr).max() < 3.0, np.abs(dr).max()
    assert np.median(np.abs(dr)) < 0.05
    np.testing.assert_allclose(a["positions"], b["positions"], atol=0.5)


def test_generate_batch_full_pad_matches_pow2(corpus):
    """The "full" batch-pad policy (TPU default: pad every chunk to
    max_batch so one program serves a whole length bucket) must write
    outputs identical to the "pow2" policy — padding rows are computed
    and discarded, never blended into real rows."""
    from zeggs_tpu.infer.batch import plan_programs

    data_dir, net_dir, clips, opts = corpus
    pipe = GesturePipeline(net_dir, data_dir, options=opts)
    reqs = [
        Request(audio=clips[i % 3][1], styles=[(clips[(i + 1) % 3][0], None)],
                file_name=f"pp_{i}", temperature=0.0, seed=100 + i)
        for i in range(3)
    ]
    out_a = data_dir.parent / "pad_pow2"
    out_b = data_dir.parent / "pad_full"
    generate_batch(pipe, reqs, out_a, bucket=64, max_batch=8, batch_pad="pow2")
    generate_batch(pipe, reqs, out_b, bucket=64, max_batch=8, batch_pad="full")
    for i in range(3):
        a = bvh.load(out_a / f"pp_{i}.bvh")
        b = bvh.load(out_b / f"pp_{i}.bvh")
        np.testing.assert_allclose(a["rotations"], b["rotations"], atol=1e-4)
        np.testing.assert_allclose(a["positions"], b["positions"], atol=1e-4)
    # and the program plan collapses to ONE (T_pad, max_batch) per bucket
    plan = plan_programs([150, 150, 150], bucket=64, max_batch=8,
                         batch_pad="full")
    assert plan == [(192, 8)]
    assert plan_programs([10, 150], bucket=64, max_batch=8, batch_pad="full") \
        == [(64, 8), (192, 8)]
