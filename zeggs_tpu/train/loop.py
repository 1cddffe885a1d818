"""pjit'd training step and host-side training loop.

Reference semantics: the monolithic `train()` in ZEGGS/train.py:29-735 —
RAdam + ExponentialLR(0.995 / 1000 iters), 18-term loss, checkpoints at
`generate_samples_step`, periodic ground/predict BVH sample pairs.

TPU-first design:
  * one jitted `train_step(params, opt_state, batch, iteration, rng)` with
    donated state; gradients all-reduce implicitly through pjit over the
    ('data',) mesh (batch sharded, params replicated),
  * style examples arrive padded + masked (static shapes, no recompiles),
  * checkpoints are code-decoupled npz pytrees (io.checkpoint), saved both
    at the root models dir and per-iteration subdirs like the reference.
"""

from __future__ import annotations

import datetime
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Options
from ..data.dataset import WindowedDataset
from ..io import checkpoint
from ..models import decoder, speech_encoder, style_encoder
from ..ops import quat, xform
from ..parallel import batch_sharding, create_mesh, create_mesh_for_batch, replicated
from ..parallel.distributed import local_batch_slice, make_replicated, put_global_batch
from ..utils import write_bvh
from . import radam as radam_lib
from .loss import compute_loss

_POSE_KEYS = ("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt")


def init_networks(key, opts: Options, dims, nlabels):
    """Construct the three networks (train.py:107-139).

    Initialization runs pinned to the HOST CPU backend and returns numpy
    leaves: it is dozens of tiny independent programs (one per tensor),
    and dispatching those through a remote-device tunnel costs a
    multi-second compile round trip EACH (measured: 582 s for one full-v1
    init through the axon tunnel vs ~2 s on host). The threefry PRNG is
    backend-independent, so the values are bit-identical either way;
    numpy leaves are uncommitted, so the first jit/pjit call uploads them
    to the accelerator in one transfer."""
    from ..utils import host_cpu

    net = opts.net
    with host_cpu():
        k1, k2, k3 = jax.random.split(key, 3)
        style_size = (
            nlabels
            if opts.train.style_encoding_type == "label"
            else net.style_encoder.style_encoding_size
        )
        params = {
            "speech_encoder": speech_encoder.init(
                k1, dims["num_audio_features"], net.speech_encoder.nhidden,
                net.speech_encoder.speech_encoding_size,
            ),
            "decoder": decoder.init(
                k2, dims["pose_input_size"], dims["pose_output_size"],
                net.speech_encoder.speech_encoding_size, style_size,
                net.decoder.nhidden, net.decoder.num_rnn_layers, net.decoder.rnn_cond,
            ),
        }
        if opts.train.style_encoding_type == "example":
            params["style_encoder"] = style_encoder.init(
                k3, dims["pose_input_size"], net.style_encoder.nhidden,
                net.style_encoder.style_encoding_size, net.style_encoder.type,
                net.style_encoder.use_vae,
            )
    return jax.tree.map(np.asarray, params)


def make_optimizer(opts: Options):
    schedule = radam_lib.exponential_step_schedule(
        opts.train.learning_rate, opts.train.learning_rate_decay, every=1000
    )
    return radam_lib.radam(schedule, eps=opts.train.eps)


def make_loss_fn(opts: Options, stats, parents, dt, deterministic=False):
    """``deterministic=True`` disables dropout and VAE sampling (style =
    mu) so the loss value is reproducible — used by the training-path
    oracle parity tests; training uses the default stochastic path."""
    net = opts.net
    style_type = opts.train.style_encoding_type
    stats = {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in stats.items()}
    train_mode = not deterministic

    def loss_fn(params, batch, iteration, rng):
        r_speech, r_style, r_vae = jax.random.split(rng, 3)
        audio = (batch["audio_features"] - stats["audio_input_mean"]) / stats["audio_input_std"]
        speech = speech_encoder.apply(
            params["speech_encoder"], audio, train=train_mode, rng=r_speech
        )

        mu = logvar = None
        if style_type == "example":
            ex = (batch["example"] - stats["anim_input_mean"]) / stats["anim_input_std"]
            style, mu, logvar = style_encoder.apply(
                params["style_encoder"], ex,
                lengths=batch["example_lengths"],
                encoder_type=net.style_encoder.type,
                use_vae=net.style_encoder.use_vae,
                style_embedding_size=net.style_encoder.style_encoding_size,
                train=train_mode, rng=r_style,
                sample_rng=None if deterministic else r_vae,
            )
        else:
            style = batch["style"]

        T = speech.shape[1]
        style_t = jnp.repeat(style[:, None], T, axis=1)
        outputs = decoder.rollout(
            params["decoder"],
            batch["root_pos"][:, 0], batch["root_rot"][:, 0],
            batch["root_vel"][:, 0], batch["root_vrt"][:, 0],
            batch["lpos"][:, 0], batch["ltxy"][:, 0],
            batch["lvel"][:, 0], batch["lvrt"][:, 0],
            batch["gaze_pos"], speech, style_t,
            stats["anim_input_mean"], stats["anim_input_std"],
            stats["anim_output_mean"], stats["anim_output_std"],
            dt, rnn_cond=net.decoder.rnn_cond,
            num_rnn_layers=net.decoder.num_rnn_layers,
            compute_dtype=jnp.dtype(opts.train.compute_dtype),
            remat=opts.train.remat,
            unroll=opts.train.unroll,
        )
        O = dict(zip(_POSE_KEYS, outputs))
        W = {k: batch[k] for k in _POSE_KEYS}
        return compute_loss(O, W, batch["gaze_pos"], parents, dt, mu, logvar, iteration)

    return loss_fn


def make_train_step(opts: Options, stats, parents, dt, mesh=None, donate=True):
    """Build (tx, jitted train_step). With a mesh, shard the batch on
    ('data',) and replicate parameters — XLA inserts the gradient psum."""
    tx = make_optimizer(opts)
    loss_fn = make_loss_fn(opts, stats, parents, dt)

    def step(params, opt_state, batch, iteration, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, iteration, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0, 1)
    if mesh is not None:
        rep = replicated(mesh)
        data = batch_sharding(mesh)
        kwargs["in_shardings"] = (rep, rep, data, None, None)
        kwargs["out_shardings"] = (rep, rep, rep)
    return tx, jax.jit(step, **kwargs)


class Trainer:
    """Host-side loop: epochs, logging, checkpointing, sample synthesis.

    Multi-host contract (call ``parallel.distributed.initialize`` first):
    every process constructs the same Trainer from the same options/seed
    over the shared filesystem corpus. The mesh spans all global devices;
    parameters and optimizer state are globally replicated
    (`make_replicated`), the shared host RNG keeps batch *indices*
    identical on every process, and each process materializes only its
    `local_batch_slice` of the batch — `put_global_batch` assembles the
    global sharded arrays, so gradient psum rides ICI within hosts and DCN
    across, exactly SURVEY.md §5's design. Checkpoints and samples are
    written by process 0 only. The device-resident corpus is replicated
    per host (every host uploads the same corpus to its local devices).

    Cross-host pacing: new train-step program shapes are compiled ahead
    of time and every rank passes a coordination-service barrier between
    compile and first execution (`_call_step`), because the collective
    backend's clique initialization has a hard deadline (~30 s gloo) that
    a compile-speed skew between hosts would blow. The rank-0-only
    checkpoint/sample I/O section is likewise fenced by host barriers so
    other ranks don't run ahead into the next step's collectives
    (`_post_step`). Both barriers ride the coordinator's gRPC KV store,
    never device collectives, so they tolerate minutes-long skews.
    """

    def __init__(
        self,
        opts: Options,
        models_dir,
        logs_dir,
        path_processed_data,
        path_data_definition,
        mesh=None,
        writer=None,
        device_corpus=True,
    ):
        self.opts = opts
        self.models_dir = Path(models_dir)
        self.logs_dir = Path(logs_dir)
        self.samples_dir = self.logs_dir / "samples"
        self.samples_dir.mkdir(parents=True, exist_ok=True)

        self.ds = WindowedDataset(
            path_data_definition,
            path_processed_data,
            opts.train.window,
            style_encoding_type=opts.train.style_encoding_type,
            example_length=opts.net.style_encoder.example_length,
        )
        self.mesh = mesh if mesh is not None else create_mesh_for_batch(opts.train.batchsize)
        self.n_proc = jax.process_count()
        if self.n_proc > 1 and opts.train.batchsize % len(jax.devices()):
            # Divisibility by process count alone is NOT enough: the batch
            # must divide the GLOBAL device count, else create_mesh_for_batch
            # shrinks the mesh below the slice and some hosts own no mesh
            # devices — their pjit calls then fail with an opaque sharding
            # error while local_batch_slice still hands them rows.
            raise ValueError(
                f"batchsize {opts.train.batchsize} must divide evenly across "
                f"{len(jax.devices())} global devices ({self.n_proc} processes)"
            )
        self.rng = np.random.default_rng(opts.train.seed)
        self.key = jax.random.PRNGKey(opts.train.seed)

        dims = self.ds.get_shapes()
        self.key, init_key = jax.random.split(self.key)
        self.params = init_networks(init_key, opts, dims, self.ds.nlabels)
        self.device_corpus = None
        if device_corpus:
            from ..data.device_dataset import DeviceCorpus, make_device_train_step

            self.device_corpus = DeviceCorpus(
                self.ds, mesh=self.mesh if self.n_proc > 1 else None
            )
            self.tx, self.train_step = make_device_train_step(
                opts, self.ds.stats, self.ds.parents, self.ds.dt,
                self.device_corpus, self.ds.nlabels, mesh=self.mesh,
            )
        else:
            self.tx, self.train_step = make_train_step(
                opts, self.ds.stats, self.ds.parents, self.ds.dt, mesh=self.mesh
            )
        if self.n_proc > 1:
            # params are identical on every process (same seed, deterministic
            # init) — lift them + optimizer state to global replicated arrays
            params_host = jax.device_get(self.params)
            self.params = make_replicated(params_host, self.mesh)
            self.opt_state = make_replicated(
                jax.device_get(self.tx.init(params_host)), self.mesh
            )
        else:
            self.opt_state = self.tx.init(self.params)
        self._barrier_seq = 0
        self._step_exe = {}
        self.iteration = 0
        self.epoch = 0
        self.writer = writer

        if opts.train.resume and (self.models_dir / "checkpoint.json").exists():
            nets, opt_state, meta = checkpoint.load_train_state(self.models_dir)
            if self.n_proc > 1:
                self.params = make_replicated(nets, self.mesh)
            else:
                self.params = jax.tree.map(jnp.asarray, nets)
            if opt_state is not None:
                restored = _restore_opt_state(self.opt_state, opt_state)
                if self.n_proc > 1:
                    restored = make_replicated(jax.device_get(restored), self.mesh)
                self.opt_state = restored
            self.iteration = int(meta["step"])
            # lossless resume: epoch counter + host RNG (data order) + PRNG
            # key (dropout/VAE noise) continue instead of replaying from
            # the seed (the reference restores neither, train.py:166-174)
            self.epoch = int(meta.get("epoch", 0))
            if "np_rng_state" in meta:
                self.rng.bit_generator.state = meta["np_rng_state"]
            if "prng_key" in meta:
                self.key = jnp.asarray(meta["prng_key"], jnp.uint32)

    # ------------------------------------------------------------------

    def run(self, max_iterations=None, log_every=10, on_step=None):
        t = self.opts.train
        total = max_iterations if max_iterations is not None else 1000 * t.niterations
        start_time = datetime.datetime.now()
        try:
            self._run_epochs(total, log_every, on_step)
        except (KeyboardInterrupt, Exception):
            # crash-safe: persist the latest state before propagating
            # (the reference loses up to generate_samples_step iterations)
            self.save_checkpoint()
            raise
        elapsed = datetime.datetime.now() - start_time
        print(f"trained to iteration {self.iteration} in {elapsed}")
        return self.params

    def _step_scalars(self, step_key):
        """(iteration, rng) step inputs. Multi-host: plain host values so
        every process contributes identical replicated inputs (a committed
        single-device array would clash with the global mesh)."""
        if self.n_proc > 1:
            return np.float32(self.iteration), np.asarray(step_key)
        return jnp.float32(self.iteration), step_key

    def _post_step(self, metrics, log_every, on_step):
        t = self.opts.train
        if self.writer is not None and (self.iteration % log_every == 0):
            self.writer.write(self.iteration, {k: float(v) for k, v in metrics.items()})
        if on_step is not None:
            on_step(self.iteration, metrics)
        if self.iteration % t.generate_samples_step == 0:
            if self.n_proc > 1:
                # Drain the just-dispatched step's collectives BEFORE the
                # rank-0-only I/O section: entering a barrier with psums
                # still in flight races two cross-process clique
                # formations against each other (observed deadlock on the
                # 2-process CPU cluster in CI).
                jax.block_until_ready((self.params, self.opt_state))
                self._host_barrier("pre_ckpt")
            self.save_checkpoint()
            try:
                self.generate_samples(3)
            except Exception as e:  # sample synthesis must not kill training
                print(f"sample synthesis failed: {e}", file=sys.stderr)
            if self.n_proc > 1:
                # other ranks wait HERE while process 0 spends seconds to
                # minutes on checkpoint writes + sample synthesis; without
                # it they would run ahead into the next step's collectives
                # and blow the backend's communicate deadline (observed:
                # gloo DEADLINE_EXCEEDED ~30 s in CI)
                self._host_barrier("post_ckpt")
        self.iteration += 1

    def _call_step(self, *args):
        """Run the train step; in multi-host mode, compile NEW program
        shapes ahead of time and barrier before first execution.

        The cross-host CPU/TPU collective backend gives clique
        INITIALIZATION a hard deadline (observed: gloo GetKeyValue
        DEADLINE_EXCEEDED at 30 s). A fresh program shape (first step, or
        a new randomized example-window length on the host-batch path)
        compiles at different speeds on different hosts, so the fast rank's
        first psum can start >30 s before the slow rank joins and the
        clique setup aborts. Compiling eagerly via AOT and passing a
        coordination-service barrier between compile and execute keeps
        every rank's collectives starting together; established cliques
        then wait indefinitely."""
        if self.n_proc == 1:
            return self.train_step(*args)
        # key on the DATA args only (args[0:2] = params/opt_state have
        # fixed shapes after __init__; hashing their thousands of leaves
        # every step would put pure overhead in the hot loop)
        key = tuple(
            (tuple(getattr(a, "shape", ())), str(getattr(a, "dtype", type(a))))
            for a in jax.tree.leaves(args[2:])
        )
        exe = self._step_exe.get(key)
        if exe is None:
            exe = self.train_step.lower(*args).compile()
            self._host_barrier("step_compile")
            self._step_exe[key] = exe
        return exe(*args)

    def _host_barrier(self, tag, timeout_ms=3_600_000):
        """Cross-process barrier via the coordination service (gRPC KV
        store), NOT a device collective: it never races with in-flight
        XLA collectives and tolerates one rank spending minutes in I/O
        (gloo collectives have a hard ~30 s communicate deadline).
        Sequence-numbered so every rank pairs up the same barrier even
        across repeated checkpoint sections."""
        from jax._src.distributed import global_state

        self._barrier_seq += 1
        global_state.client.wait_at_barrier(
            f"zeggs_{tag}_{self._barrier_seq}", timeout_in_ms=timeout_ms
        )

    def _run_epochs(self, total, log_every, on_step):
        if self.device_corpus is not None:
            self._run_epochs_device(total, log_every, on_step)
            return
        t = self.opts.train
        ds = self.ds
        example_mode = t.style_encoding_type == "example"
        while self.iteration < total:
            # the permutation and example-length draws come from the shared
            # host RNG: identical on every process, so global batch indices
            # agree and each process materializes only its local rows
            order = self.rng.permutation(len(ds))
            for b in range(len(order) // t.batchsize):
                if self.iteration >= total:
                    break
                idx = order[b * t.batchsize : (b + 1) * t.batchsize]
                ewl = ds.sample_example_length(self.rng) if example_mode else None
                if self.n_proc > 1:
                    s, e = local_batch_slice(t.batchsize)
                    idx = idx[s:e]
                batch = ds.make_batch(idx, example_window_length=ewl)
                batch_dev = put_global_batch(batch, self.mesh)
                self.key, step_key = jax.random.split(self.key)
                it_val, key_val = self._step_scalars(step_key)
                self.params, self.opt_state, metrics = self._call_step(
                    self.params, self.opt_state, batch_dev, it_val, key_val,
                )
                self._post_step(metrics, log_every, on_step)
            self.epoch += 1

    def _run_epochs_device(self, total, log_every, on_step):
        """Device-resident-corpus loop: only index vectors cross H2D."""
        t = self.opts.train
        ds = self.ds
        label_mode = t.style_encoding_type == "label"
        while self.iteration < total:
            order = self.rng.permutation(len(ds))
            for b in range(len(order) // t.batchsize):
                if self.iteration >= total:
                    break
                idx = order[b * t.batchsize : (b + 1) * t.batchsize]
                ewl = None if label_mode else ds.sample_example_length(self.rng)
                if self.n_proc > 1:
                    s, e = local_batch_slice(t.batchsize)
                    idx = idx[s:e]
                if label_mode:
                    starts = ds.window_starts[idx].astype(np.int32)
                    ex_arg = ds.window_labels[idx].astype(np.int32)
                    ex_len = np.zeros(len(idx), np.int32)
                else:
                    starts, ex_arg, ex_len = self.device_corpus.sample_indices(idx, ewl)
                args = put_global_batch((starts, ex_arg, ex_len), self.mesh)
                self.key, step_key = jax.random.split(self.key)
                it_val, key_val = self._step_scalars(step_key)
                self.params, self.opt_state, metrics = self._call_step(
                    self.params, self.opt_state, *args, it_val, key_val,
                )
                self._post_step(metrics, log_every, on_step)
            self.epoch += 1

    # ------------------------------------------------------------------

    def save_checkpoint(self):
        if self.n_proc > 1 and jax.process_index() != 0:
            return  # shared filesystem: process 0 owns the checkpoint files
        nets = {k: jax.device_get(v) for k, v in self.params.items()}
        opt = jax.device_get(self.opt_state)
        extra = {
            "epoch": self.epoch,
            "np_rng_state": self.rng.bit_generator.state,
            "prng_key": np.asarray(jax.device_get(self.key)).tolist(),
        }
        checkpoint.save_train_state(self.models_dir, self.iteration, nets, opt, extra)
        per_iter = self.models_dir / str(self.iteration)
        checkpoint.save_train_state(per_iter, self.iteration, nets, opt, extra)

    def generate_samples(self, n=3, length_s=30):
        """Ground/predict BVH pairs for train+valid clips (train.py:477-729)."""
        params = self.params
        if self.n_proc > 1:
            if jax.process_index() != 0:
                return  # local-compute path; only process 0 writes samples
            # pull replicated globals to host so the local (non-mesh) jit
            # programs below can consume them
            params = jax.tree.map(np.asarray, jax.device_get(self.params))
        # DEDICATED deterministic generator — never self.rng: sample
        # synthesis runs on process 0 only, and consuming the shared host
        # RNG there would silently desynchronize the batch-index /
        # example-length draws the multi-host contract requires to be
        # identical on every process. (Also keeps the training data stream
        # independent of how often samples are generated.)
        rng = np.random.default_rng([self.opts.train.seed, 0x5A11, self.iteration])
        stats = {k: jnp.asarray(v) for k, v in self.ds.stats.items()}
        for which in ("train", "valid"):
            for i in range(n):
                sample, label, (s, e), _ = self.ds.get_sample(which, length_s, rng=rng)
                audio = (jnp.asarray(sample["audio_features"]) - stats["audio_input_mean"]) / stats[
                    "audio_input_std"
                ]
                speech = speech_encoder.apply(params["speech_encoder"], audio, train=False)
                if self.opts.train.style_encoding_type == "example":
                    ewl = self.ds.sample_example_length(rng)
                    vec = self.ds.get_example(s, s + self.ds.window, (s, e), ewl)
                    ex = (jnp.asarray(vec[None]) - stats["anim_input_mean"]) / stats["anim_input_std"]
                    style, _, _ = style_encoder.apply(
                        params["style_encoder"], ex,
                        encoder_type=self.opts.net.style_encoder.type,
                        use_vae=self.opts.net.style_encoder.use_vae,
                        style_embedding_size=self.opts.net.style_encoder.style_encoding_size,
                        sample_rng=None,
                    )
                else:
                    style = jnp.zeros((1, self.ds.nlabels)).at[0, label].set(1.0)
                T = speech.shape[1]
                style_t = jnp.repeat(style[:, None], T, axis=1)
                out = decoder.rollout(
                    params["decoder"],
                    *(jnp.asarray(sample[k][:, 0]) for k in _POSE_KEYS),
                    jnp.asarray(sample["gaze_pos"]), speech, style_t,
                    stats["anim_input_mean"], stats["anim_input_std"],
                    stats["anim_output_mean"], stats["anim_output_std"],
                    self.ds.dt, rnn_cond=self.opts.net.decoder.rnn_cond,
                    num_rnn_layers=self.opts.net.decoder.num_rnn_layers,
                )
                label_name = self.ds.label_names[label]
                for tag, (rp, rr, lp, lt) in {
                    "ground": (
                        sample["root_pos"][0], sample["root_rot"][0],
                        sample["lpos"][0], sample["ltxy"][0],
                    ),
                    "predict": (
                        np.asarray(out[0][0]), np.asarray(out[1][0]),
                        np.asarray(out[4][0]), np.asarray(out[5][0]),
                    ),
                }.items():
                    lrot = np.asarray(quat.from_xform(xform.orthogonalize_from_xy(jnp.asarray(lt))))
                    write_bvh(
                        str(
                            self.samples_dir
                            / f"iteration_{self.iteration}_{which}_{tag}_{i}_{label_name}.bvh"
                        ),
                        np.asarray(rp), np.asarray(rr), np.asarray(lp), lrot,
                        parents=self.ds.parents, names=self.ds.bone_names,
                        order="zyx", dt=self.ds.dt,
                    )


def _restore_opt_state(template, loaded):
    """Rebuild the RAdamState NamedTuple from the flattened checkpoint."""
    flat_t, treedef = jax.tree.flatten(template)
    flat_l, _ = jax.tree.flatten(loaded)
    if len(flat_t) != len(flat_l):
        raise ValueError("optimizer state mismatch on resume")
    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in flat_l])
