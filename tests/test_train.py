"""Training-layer tests: RAdam parity, loss behavior, pipeline -> dataset ->
sharded train step on the 8-device CPU mesh."""

import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from zeggs_tpu import config as C
from zeggs_tpu.data.dataset import WindowedDataset
from zeggs_tpu.data.pipeline import data_pipeline
from zeggs_tpu.parallel import create_mesh
from zeggs_tpu.train import radam as R
from zeggs_tpu.train.loop import Trainer, init_networks, make_train_step
from zeggs_tpu.train.loss import compute_loss, kl_divergence
from tests.synthetic import (
    LABELS,
    PARENTS,
    small_options,
    write_raw_corpus,
)

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# RAdam
# ---------------------------------------------------------------------------

def test_radam_matches_torch():
    """Our optax RAdam == torch.optim.RAdam over 30 steps on a quadratic."""
    w0 = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    target = np.ones((5, 3), np.float32)

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.RAdam([wt], lr=1e-2, betas=(0.9, 0.999), eps=1e-5)
    for _ in range(30):
        opt.zero_grad()
        loss = ((wt - torch.from_numpy(target)) ** 2).sum()
        loss.backward()
        opt.step()

    # jax side
    tx = R.radam(1e-2, eps=1e-5)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((p["w"] - jnp.asarray(target)) ** 2)

    for _ in range(30):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), atol=2e-4)


def test_radam_early_steps_sgd_fallback():
    """First few steps (N_sma < 5) must follow the bias-corrected-SGD branch."""
    tx = R.radam(0.1)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    updates, state = tx.update(g, state, params)
    # step 1: m = 0.1*g, sgd step = 1/(1-0.9) = 10 -> update = -0.1*10*0.1 = -0.1
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, atol=1e-6)


def test_lr_schedule_steps_every_1000():
    sched = R.exponential_step_schedule(1e-4, 0.995, every=1000)
    assert float(sched(jnp.asarray(0))) == pytest.approx(1e-4)
    assert float(sched(jnp.asarray(999))) == pytest.approx(1e-4)
    assert float(sched(jnp.asarray(1000))) == pytest.approx(1e-4 * 0.995)
    assert float(sched(jnp.asarray(2500))) == pytest.approx(1e-4 * 0.995**2)


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def _random_pose_traj(B=2, T=5, J=len(PARENTS), seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, T, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return {
        "root_pos": jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32)),
        "root_rot": jnp.asarray(q),
        "root_vel": jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32)),
        "root_vrt": jnp.asarray(rng.normal(size=(B, T, 3)).astype(np.float32)),
        "lpos": jnp.asarray(rng.normal(size=(B, T, J, 3)).astype(np.float32)),
        "ltxy": jnp.asarray(rng.normal(size=(B, T, J, 2, 3)).astype(np.float32)),
        "lvel": jnp.asarray(rng.normal(size=(B, T, J, 3)).astype(np.float32)),
        "lvrt": jnp.asarray(rng.normal(size=(B, T, J, 3)).astype(np.float32)),
    }


def test_loss_zero_for_identical():
    W = _random_pose_traj()
    gaze = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 3)).astype(np.float32))
    loss, m = compute_loss(W, W, gaze, PARENTS, 1 / 60)
    assert float(loss) < 1e-5
    assert float(m["loss_gaze"]) < 1e-6


def test_loss_positive_for_different():
    W = _random_pose_traj(seed=0)
    O = _random_pose_traj(seed=1)
    gaze = jnp.zeros((2, 5, 3))
    loss, m = compute_loss(O, W, gaze, PARENTS, 1 / 60)
    assert float(loss) > 0.1
    assert all(np.isfinite(float(v)) for v in m.values())


def test_loss_is_differentiable():
    W = _random_pose_traj(seed=0)
    O = _random_pose_traj(seed=1)
    gaze = jnp.zeros((2, 5, 3))

    def f(scale):
        Os = jax.tree.map(lambda x: x * scale, O)
        return compute_loss(Os, W, gaze, PARENTS, 1 / 60)[0]

    g = jax.grad(f)(jnp.float32(1.0))
    assert np.isfinite(float(g))


def test_kl_annealing_schedule():
    mu = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))
    kl, w0 = kl_divergence(mu, logvar, 0)
    assert float(kl) == pytest.approx(0.0, abs=1e-6)
    _, w_mid = kl_divergence(mu, logvar, 7500)
    _, w_late = kl_divergence(mu, logvar, 100000)
    assert float(w0) < 1e-8
    assert float(w_mid) == pytest.approx(0.2)  # logistic(center)=0.5 capped at 0.2
    assert float(w_late) == pytest.approx(0.2)
    # nonzero KL for non-standard posterior
    kl2, _ = kl_divergence(mu + 1.0, logvar, 0)
    assert float(kl2) > 0.4


# ---------------------------------------------------------------------------
# pipeline -> dataset -> train step
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def processed_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw_corpus")
    write_raw_corpus(root, n_clips=3, seconds=4.0)
    conf = C.PipelineConfig(
        base_path=str(root),
        processed_data_path="processed",
        info_filename="info.csv",
        audio_conf=C.MelConfig(normalize_loudness=False),
        len_ratios=(0.9, 1.0),
        save_trimmed_audio=False,
        save_trimmed_animation=False,
    )
    data_pipeline(conf)
    return root / "processed"


def test_pipeline_artifacts(processed_corpus):
    d = np.load(processed_corpus / "processed_data.npz")
    assert d["X_audio_features"].shape[1] == 81
    # 2 train clips x 2 stretches
    assert len(d["ranges_train"]) == 4
    assert len(d["ranges_valid"]) == 2
    assert d["anim_input_mean"].shape == (6 + len(PARENTS) * 15 + 3,)
    assert d["anim_output_std"].shape == (6 + len(PARENTS) * 15,)
    # per-group scalar input stds: first three dims (root_vel) identical
    std = d["anim_input_std"]
    assert std[0] == std[1] == std[2]
    dd = json.loads((processed_corpus / "data_definition.json").read_text())
    assert dd["parents"] == PARENTS
    assert sorted(dd["label_names"]) == sorted(set(LABELS))
    # dataset summary export (reference: console.save_html -> data_info.html)
    html = (processed_corpus / "data_info.html").read_text()
    assert "Data Info" in html and "Total length of dataset" in html
    for label in set(LABELS):
        assert label in html
    # acting trim: 3.5 s - 0.5 s = 3 s -> 180 frames at ratio 1.0 (per clip)
    lens = (d["ranges_train"][:, 1] - d["ranges_train"][:, 0]).tolist()
    assert 180 in lens and 162 in lens  # 1.0x and 0.9x


def test_dataset_windows_and_examples(processed_corpus):
    opts = small_options()
    ds = WindowedDataset(
        processed_corpus / "data_definition.json",
        processed_corpus / "processed_data.npz",
        window=opts.train.window,
        style_encoding_type="example",
        example_length=opts.net.style_encoder.example_length,
    )
    assert len(ds) > 0
    rng = np.random.default_rng(0)
    batch = ds.make_batch(rng.integers(0, len(ds), size=4), rng=rng)
    assert batch["audio_features"].shape == (4, 32, 81)
    assert batch["lpos"].shape == (4, 32, len(PARENTS), 3)
    assert batch["example"].shape[0] == 4
    assert batch["example"].shape[1] == 2 * opts.net.style_encoder.example_length
    assert (batch["example_lengths"] >= opts.net.style_encoder.example_length // 2 * 2).all()
    # example rows are zero beyond their length
    for i in range(4):
        L = batch["example_lengths"][i]
        assert np.abs(batch["example"][i, L:]).sum() == 0


def test_train_step_runs_and_learns(processed_corpus):
    opts = small_options()
    ds = WindowedDataset(
        processed_corpus / "data_definition.json",
        processed_corpus / "processed_data.npz",
        window=opts.train.window,
        style_encoding_type="example",
        example_length=opts.net.style_encoder.example_length,
    )
    mesh = create_mesh(8)
    key = jax.random.PRNGKey(0)
    params = init_networks(key, opts, ds.get_shapes(), ds.nlabels)
    tx, step = make_train_step(opts, ds.stats, ds.parents, ds.dt, mesh=mesh)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    losses = []
    batch = ds.make_batch(rng.integers(0, len(ds), size=8), rng=rng)
    for i in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, jnp.float32(i), sub)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    # single repeated batch must be learnable
    assert losses[-1] < losses[0]


def test_label_style_train_step(processed_corpus):
    opts = small_options()
    opts = C.Options(
        net=opts.net,
        train=C.TrainConfig(batchsize=8, window=32, style_encoding_type="label"),
    )
    ds = WindowedDataset(
        processed_corpus / "data_definition.json",
        processed_corpus / "processed_data.npz",
        window=32,
        style_encoding_type="label",
    )
    mesh = create_mesh(4)
    key = jax.random.PRNGKey(1)
    params = init_networks(key, opts, ds.get_shapes(), ds.nlabels)
    assert "style_encoder" not in params
    tx, step = make_train_step(opts, ds.stats, ds.parents, ds.dt, mesh=mesh)
    opt_state = tx.init(params)
    rng = np.random.default_rng(1)
    batch = ds.make_batch(rng.integers(0, len(ds), size=8), rng=rng)
    assert batch["style"].shape == (8, ds.nlabels)
    params, opt_state, metrics = step(params, opt_state, batch, jnp.float32(0), key)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["loss_kl_div"]) == 0.0


def test_device_corpus_batch_matches_host(processed_corpus):
    """On-device gather == host make_batch for the same indices/length."""
    from zeggs_tpu.data.device_dataset import DeviceCorpus

    opts = small_options()
    ds = WindowedDataset(
        processed_corpus / "data_definition.json",
        processed_corpus / "processed_data.npz",
        window=opts.train.window,
        style_encoding_type="example",
        example_length=opts.net.style_encoder.example_length,
    )
    corpus = DeviceCorpus(ds)
    rng = np.random.default_rng(5)
    idx = rng.integers(0, len(ds), size=4)
    ewl = 96
    host = ds.make_batch(idx, example_window_length=ewl)
    starts, ex_idx, ex_len = corpus.sample_indices(idx, ewl)
    dev = corpus.gather_batch(jnp.asarray(starts), jnp.asarray(ex_idx), jnp.asarray(ex_len))
    for k in ("audio_features", "lpos", "ltxy", "root_rot", "gaze_pos"):
        np.testing.assert_allclose(np.asarray(dev[k]), host[k], atol=1e-6, err_msg=k)
    np.testing.assert_array_equal(np.asarray(dev["example_lengths"]), host["example_lengths"])
    np.testing.assert_allclose(np.asarray(dev["example"]), host["example"], atol=1e-6)


def test_device_train_step_runs(processed_corpus):
    from zeggs_tpu.data.device_dataset import DeviceCorpus, make_device_train_step

    opts = small_options()
    ds = WindowedDataset(
        processed_corpus / "data_definition.json",
        processed_corpus / "processed_data.npz",
        window=opts.train.window,
        style_encoding_type="example",
        example_length=opts.net.style_encoder.example_length,
    )
    corpus = DeviceCorpus(ds)
    mesh = create_mesh(4)
    key = jax.random.PRNGKey(0)
    params = init_networks(key, opts, ds.get_shapes(), ds.nlabels)
    tx, step = make_device_train_step(
        opts, ds.stats, ds.parents, ds.dt, corpus, ds.nlabels, mesh=mesh
    )
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(ds), size=8)
    starts, ex_idx, ex_len = corpus.sample_indices(idx, 64)
    losses = []
    for i in range(4):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(
            params, opt_state, jnp.asarray(starts), jnp.asarray(ex_idx),
            jnp.asarray(ex_len), jnp.float32(i), sub,
        )
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_gru_style_encoder_train_step(processed_corpus):
    """Training with the GRU-body style encoder variant."""
    base = small_options()
    opts = C.Options(
        net=C.NetworkConfig(
            decoder=base.net.decoder,
            speech_encoder=base.net.speech_encoder,
            style_encoder=C.StyleEncoderConfig(
                nhidden=16, style_encoding_size=8, example_length=64,
                type="gru", use_vae=True,
            ),
        ),
        train=C.TrainConfig(batchsize=4, window=32),
    )
    ds = WindowedDataset(
        processed_corpus / "data_definition.json",
        processed_corpus / "processed_data.npz",
        window=32, style_encoding_type="example", example_length=64,
    )
    mesh = create_mesh(4)
    key = jax.random.PRNGKey(2)
    params = init_networks(key, opts, ds.get_shapes(), ds.nlabels)
    assert "gru_fwd" in params["style_encoder"]["body"]
    tx, step = make_train_step(opts, ds.stats, ds.parents, ds.dt, mesh=mesh)
    opt_state = tx.init(params)
    rng = np.random.default_rng(2)
    batch = ds.make_batch(rng.integers(0, len(ds), size=4), rng=rng)
    params, opt_state, metrics = step(params, opt_state, batch, jnp.float32(0), key)
    assert np.isfinite(float(metrics["total_loss"]))


def test_film_decoder_train_step(processed_corpus):
    """Training with the FiLM-conditioned decoder cell."""
    base = small_options()
    opts = C.Options(
        net=C.NetworkConfig(
            decoder=C.DecoderConfig(nhidden=16, num_rnn_layers=2, rnn_cond="film"),
            speech_encoder=base.net.speech_encoder,
            style_encoder=base.net.style_encoder,
        ),
        train=C.TrainConfig(batchsize=4, window=32),
    )
    ds = WindowedDataset(
        processed_corpus / "data_definition.json",
        processed_corpus / "processed_data.npz",
        window=32, style_encoding_type="example", example_length=64,
    )
    key = jax.random.PRNGKey(3)
    params = init_networks(key, opts, ds.get_shapes(), ds.nlabels)
    assert "gammas" in params["decoder"]["cell"]
    tx, step = make_train_step(opts, ds.stats, ds.parents, ds.dt, mesh=create_mesh(4))
    opt_state = tx.init(params)
    rng = np.random.default_rng(3)
    batch = ds.make_batch(rng.integers(0, len(ds), size=4), rng=rng)
    params, opt_state, metrics = step(params, opt_state, batch, jnp.float32(0), key)
    assert np.isfinite(float(metrics["total_loss"]))


def test_pipeline_with_process_pool(tmp_path):
    """Pipeline workers (spawn + CPU-pinned children) produce identical
    output to the serial path."""
    from tests.synthetic import write_raw_corpus

    write_raw_corpus(tmp_path, n_clips=2, seconds=3.0)
    mk = lambda out, save: C.PipelineConfig(
        base_path=str(tmp_path), processed_data_path=out, info_filename="info.csv",
        audio_conf=C.MelConfig(normalize_loudness=False), len_ratios=(1.0,),
        save_trimmed_audio=False, save_trimmed_animation=False, save_final_data=save,
    )
    serial, _ = data_pipeline(mk("p_serial", False))
    parallel, _ = data_pipeline(mk("p_pool", False), num_workers=2)
    np.testing.assert_allclose(
        serial["X_audio_features"], parallel["X_audio_features"], atol=1e-6
    )
    np.testing.assert_allclose(serial["Y_lpos"], parallel["Y_lpos"], atol=1e-6)


def test_pipeline_host_sharding_merge_equals_serial(tmp_path):
    """Sharded pipeline + merge reproduces the serial run BIT-EXACTLY —
    in particular the normalization statistics are global, never per-host
    (a per-host stats.npz would silently corrupt multi-host training)."""
    from zeggs_tpu.data.pipeline import merge_shards
    from tests.synthetic import write_raw_corpus

    write_raw_corpus(tmp_path, n_clips=3, seconds=3.0)
    conf = lambda out: C.PipelineConfig(
        base_path=str(tmp_path), processed_data_path=out, info_filename="info.csv",
        audio_conf=C.MelConfig(normalize_loudness=False), len_ratios=(1.0,),
        save_trimmed_audio=False, save_trimmed_animation=False, save_final_data=False,
    )
    s0, _ = data_pipeline(conf("shards"), process_index=0, process_count=2)
    s1, _ = data_pipeline(conf("shards"), process_index=1, process_count=2)
    assert s0 is None and s1 is None  # shard mode defers assembly to merge
    assert (tmp_path / "shards" / "pipeline_shard_0_of_2.npz").exists()
    assert (tmp_path / "shards" / "pipeline_shard_1_of_2.npz").exists()

    merged, merged_def = merge_shards(conf("shards"), process_count=2)
    serial, serial_def = data_pipeline(conf("serial"))
    assert merged_def["label_names"] == serial_def["label_names"]
    assert set(merged) == set(serial)
    for k in serial:
        np.testing.assert_array_equal(merged[k], serial[k], err_msg=k)


def test_pipeline_debug_artifacts(tmp_path):
    """save_normalized_animations + visualizers write their files."""
    from tests.synthetic import write_raw_corpus

    write_raw_corpus(tmp_path, n_clips=1, seconds=3.0)
    conf = C.PipelineConfig(
        base_path=str(tmp_path), processed_data_path="processed",
        info_filename="info.csv", audio_conf=C.MelConfig(normalize_loudness=False),
        len_ratios=(1.0,), save_trimmed_audio=False, save_trimmed_animation=False,
        save_final_data=False, save_normalized_animations=True,
        visualize_gaze=True, visualize_spectrogram=True,
    )
    data_pipeline(conf)
    dbg = tmp_path / "processed" / "normalized_animations"
    assert list(dbg.glob("*_norm.bvh")) and list(dbg.glob("*_denorm.bvh"))
    assert list(dbg.glob("*_gaze.png")) and list(dbg.glob("*_spec.png"))
    # the denormalized animation must reproduce the original root positions
    from zeggs_tpu.io import bvh as bvh_io

    orig = bvh_io.load(tmp_path / "original" / "000_Synth_0.bvh")
    denorm = bvh_io.load(next(dbg.glob("*_denorm.bvh")))
    n = denorm["positions"].shape[0]
    np.testing.assert_allclose(
        denorm["positions"][:, 0], orig["positions"][30 : 30 + n, 0], atol=1e-2
    )


# ---------------------------------------------------------------------------
# Trainer: end-to-end run / checkpoint / lossless resume (VERDICT r1 item 4)
# ---------------------------------------------------------------------------

def _trainer_opts(gss, resume=False):
    base = small_options()
    return C.Options(
        net=base.net,
        train=C.TrainConfig(
            batchsize=8, window=32, niterations=1, resume=resume, seed=77,
            generate_samples_step=gss, use_tensorboard=False,
        ),
    )


def test_trainer_run_resume_lossless(tmp_path):
    """Trainer.run -> checkpoint -> new Trainer(resume=True): iteration,
    epoch, host RNG and PRNG key all continue, and the resumed run
    reproduces an uninterrupted run's parameters exactly."""
    from tests.synthetic import write_raw_corpus

    write_raw_corpus(tmp_path, n_clips=3, seconds=2.5)
    conf = C.PipelineConfig(
        base_path=str(tmp_path), processed_data_path="processed",
        info_filename="info.csv", audio_conf=C.MelConfig(normalize_loudness=False),
        len_ratios=(1.0,), save_trimmed_audio=False, save_trimmed_animation=False,
    )
    data_pipeline(conf)
    dd = tmp_path / "processed" / "data_definition.json"
    pd_ = tmp_path / "processed" / "processed_data.npz"

    probe = WindowedDataset(dd, pd_, 32, style_encoding_type="example",
                            example_length=small_options().net.style_encoder.example_length)
    bpe = len(probe) // 8  # device-corpus batches per epoch
    assert bpe >= 2

    # --- phase 1: train one epoch, checkpoint, "crash" -------------------
    m1, l1 = tmp_path / "m_resume", tmp_path / "l_resume"
    t1 = Trainer(_trainer_opts(gss=bpe), m1, l1, pd_, dd)
    t1.run(max_iterations=bpe)
    t1.save_checkpoint()
    assert (t1.iteration, t1.epoch) == (bpe, 1)

    # sample synthesis wrote finite ground/predict BVH pairs at iteration 0
    samples = sorted((l1 / "samples").glob("iteration_0_*_ground_*.bvh"))
    assert samples, "no ground samples written"
    from zeggs_tpu.io import bvh as bvh_io

    s = bvh_io.load(samples[0])
    assert np.isfinite(s["positions"]).all() and np.isfinite(s["rotations"]).all()

    # --- phase 2: resume restores every piece of loop state --------------
    t2 = Trainer(_trainer_opts(gss=bpe, resume=True), m1, l1, pd_, dd)
    assert t2.iteration == t1.iteration
    assert t2.epoch == t1.epoch
    assert t2.rng.bit_generator.state == t1.rng.bit_generator.state
    np.testing.assert_array_equal(np.asarray(t2.key), np.asarray(t1.key))
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.run(max_iterations=2 * bpe)
    assert (t2.iteration, t2.epoch) == (2 * bpe, 2)

    # --- uninterrupted control run: identical final parameters -----------
    m3, l3 = tmp_path / "m_full", tmp_path / "l_full"
    t3 = Trainer(_trainer_opts(gss=bpe), m3, l3, pd_, dd)
    t3.run(max_iterations=2 * bpe)
    for a, b in zip(jax.tree.leaves(t2.params), jax.tree.leaves(t3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
