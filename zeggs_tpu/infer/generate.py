"""Gesture generation: speech audio + style -> BVH animation.

Public surface mirrors the reference `generate_gesture`
(ZEGGS/generate.py:22-411): styles as BVH examples / raw embedding vectors /
label names, "add" blending (weighted embedding mix) or "stitch"
(per-frame transitions), first-pose override, VAE temperature, seeds, and
audio=None -> style-embedding-only mode.

TPU-first design:
  * networks/stats load once into a `GesturePipeline`; encode + rollout are
    jit-compiled and cached across calls,
  * sequence lengths are bucketed (rounded up, masked/sliced) so a CSV batch
    of differently-sized clips reuses a handful of compiled programs,
  * `generate_batch` rolls out many clips in one batched scan — sharded over
    the device mesh's data axis for multi-chip serving.
"""

from __future__ import annotations

import json
from pathlib import Path
from shutil import copyfile

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..data import features as F
from ..io import bvh, checkpoint, wav
from ..models import decoder, pose, speech_encoder, style_encoder
from ..ops import mel, quat, xform
from ..utils import host_cpu, split_by_ratio, write_bvh


@jax.jit
def _ltxy_to_quat(ltxy):
    """rot6d -> quaternion for BVH export (jitted: the eager 75-joint
    orthogonalize/from_xform chain costs ~0.4 s per clip on host CPU)."""
    return quat.from_xform(xform.orthogonalize_from_xy(ltxy))


def _round_up(n, m):
    return ((n + m - 1) // m) * m


class GesturePipeline:
    """Loads networks + stats once and serves generation requests."""

    def __init__(self, network_path, data_path, options=None, style_encoding_type="example",
                 fused_b1="auto", transfer_dtype=None):
        """fused_b1: use the whole-rollout fused Pallas kernel for B=1
        requests ("auto" = on TPU when the cell qualifies; True/False to
        force; "int8" = the quantized variant — half the weight-streaming
        bytes, int8 MXU dots, pose error ~1e-3 vs ~1e-4 for bf16; also
        selectable via ZEGGS_FUSED_INT8=1). Batched requests always take
        the XLA scan path.

        transfer_dtype: dtype for the rollout outputs pulled to host
        ("float16" halves device->host bytes — the bottleneck for large
        CSV batches through slow links — at ~1e-3 relative pose error;
        default fp32; env ZEGGS_TRANSFER_DTYPE overrides)."""
        network_path = Path(network_path)
        data_path = Path(data_path)
        self.style_encoding_type = style_encoding_type
        self.opts = options or Options()

        with open(data_path / "data_definition.json") as f:
            dd = json.load(f)
        self.parents = np.asarray(dd["parents"], np.int32)
        self.bone_names = dd["bone_names"]
        self.label_names = dd["label_names"]
        self.dt = float(dd["dt"])
        self.njoints = len(self.bone_names)

        conf_path = data_path / "data_pipeline_conf.json"
        with open(conf_path) as f:
            conf = json.load(f)
        self.mel_cfg = mel.MelConfig.from_dict(conf.get("audio_conf", conf))
        self.audio_feature_type = tuple(conf.get("audio_feature_type", ("mel_spec", "energy")))

        stats = np.load(data_path / "stats.npz")
        self.stats = {k: jnp.asarray(np.asarray(stats[k], np.float32)) for k in stats.files}

        self.networks = self._load_networks(network_path)
        se_cfg = self.opts.net.style_encoder
        self.style_encoding_size = (
            len(self.label_names) if style_encoding_type == "label" else se_cfg.style_encoding_size
        )
        self._rollout_cache = {}
        self._style_cache = {}
        self._fused_fn = None
        dec_cfg = self.opts.net.decoder
        import os as _os

        if fused_b1 == "auto" and _os.environ.get("ZEGGS_FUSED_INT8"):
            fused_b1 = "int8"
        # quantize the BATCHED scan rollout too when int8 is requested and
        # the cell supports it (inference only, 'normal' cell)
        self._quantize_batched = bool(
            fused_b1 == "int8"
            and jax.default_backend() == "tpu"
            and dec_cfg.rnn_cond == "normal"
        )
        transfer_dtype = transfer_dtype or _os.environ.get("ZEGGS_TRANSFER_DTYPE")
        self._transfer_dtype = (
            jnp.dtype(transfer_dtype) if transfer_dtype else None
        )
        if fused_b1 in ("auto", "int8"):
            supported = jax.default_backend() == "tpu" and decoder.fused_b1_supported(
                self.networks["decoder"], dec_cfg.rnn_cond, dec_cfg.num_rnn_layers
            )
            fused_b1 = (fused_b1 if supported else False) if fused_b1 == "int8" else supported
        if fused_b1:
            self._fused_fn = decoder.make_fused_b1_fn(
                self.networks["decoder"],
                self.stats["anim_input_mean"], self.stats["anim_input_std"],
                self.stats["anim_output_mean"], self.stats["anim_output_std"],
                self.dt,
                weights_dtype=jnp.int8 if fused_b1 == "int8" else jnp.bfloat16,
            )
        self._build_jitted()

    def _build_jitted(self):
        stats = self.stats
        nets = self.networks
        se_cfg = self.opts.net.style_encoder

        @jax.jit
        def encode_speech(audio_features):
            x = (audio_features - stats["audio_input_mean"]) / stats["audio_input_std"]
            return speech_encoder.apply(nets["speech_encoder"], x[None], train=False)

        @jax.jit
        def encode_speech_batched(audio_features):
            x = (audio_features - stats["audio_input_mean"]) / stats["audio_input_std"]
            return speech_encoder.apply(nets["speech_encoder"], x, train=False)

        self._encode_speech_batched = encode_speech_batched

        def encode_style(example, length, temperature, rng, stochastic):
            x = (example - stats["anim_input_mean"]) / stats["anim_input_std"]
            return style_encoder.apply(
                nets["style_encoder"],
                x[None],
                lengths=jnp.asarray([length]),
                encoder_type=se_cfg.type,
                use_vae=se_cfg.use_vae,
                style_embedding_size=se_cfg.style_encoding_size,
                temperature=temperature,
                sample_rng=rng if stochastic else None,
            )

        self._encode_speech = encode_speech
        self._encode_style_stoch = jax.jit(
            lambda e, l, t, r: encode_style(e, l, t, r, True)
        )
        self._encode_style_det = jax.jit(
            lambda e, l: encode_style(e, l, 1.0, None, False)
        )

        @jax.jit
        def encode_styles_many(padded, lengths, temps, keys):
            """Batched style encode reproducing the per-request single-path
            draws bit for bit: apply() returns mu/logvar, and the
            reparameterization eps is drawn per example from ITS key with
            the same (1, C) shape the single path uses."""
            x = (padded - stats["anim_input_mean"]) / stats["anim_input_std"]
            enc, mu, logvar = style_encoder.apply(
                nets["style_encoder"], x, lengths=lengths,
                encoder_type=se_cfg.type, use_vae=se_cfg.use_vae,
                style_embedding_size=se_cfg.style_encoding_size,
                temperature=1.0, sample_rng=None,
            )
            if mu is None:  # no VAE head
                return enc
            C = mu.shape[-1]
            std = jnp.exp(0.5 * logvar) / jnp.maximum(temps, 1e-9)[:, None]
            eps = jax.vmap(lambda k: jax.random.normal(k, (1, C)))(keys)[:, 0]
            return mu + jnp.where(temps[:, None] > 0.0, eps * std, 0.0)

        self._encode_styles_many = encode_styles_many

    # -- loading ----------------------------------------------------------

    def _load_networks(self, network_path):
        nets = {}
        for name in ("speech_encoder", "decoder", "style_encoder"):
            npz = network_path / f"{name}.npz"
            if npz.exists():
                nets[name], _ = checkpoint.load(npz)
        needed = ["speech_encoder", "decoder"]
        if self.style_encoding_type == "example":
            needed.append("style_encoder")
        if any(n not in nets for n in needed):
            from ..io import torch_compat

            torch_nets = torch_compat.load_reference_networks(
                network_path, self.style_encoding_type, self.opts.net.decoder.rnn_cond
            )
            for k, v in torch_nets.items():
                nets.setdefault(k, v)
        missing = [n for n in needed if n not in nets]
        if missing:
            raise FileNotFoundError(f"missing network checkpoints in {network_path}: {missing}")
        return nets

    # -- jitted kernels ---------------------------------------------------

    def _rollout_fn(self, n_frames):
        if n_frames not in self._rollout_cache:
            dec_cfg = self.opts.net.decoder
            fused = self._fused_fn

            @jax.jit
            def fn(state0, gaze_pos, speech_enc, style_enc):
                if fused is not None and speech_enc.shape[0] == 1:
                    out = fused(state0, gaze_pos, speech_enc, style_enc)
                    out = tuple(out[i] for i in (0, 1, 4, 5))
                else:
                    out = decoder.rollout(
                        self.networks["decoder"],
                        *state0,
                        gaze_pos,
                        speech_enc,
                        style_enc,
                        self.stats["anim_input_mean"],
                        self.stats["anim_input_std"],
                        self.stats["anim_output_mean"],
                        self.stats["anim_output_std"],
                        self.dt,
                        rnn_cond=dec_cfg.rnn_cond,
                        num_rnn_layers=dec_cfg.num_rnn_layers,
                        # inference consumes (root_pos, root_rot, lpos, ltxy);
                        # selecting here halves rollout HBM for large batches
                        output_indices=(0, 1, 4, 5),
                        # ZEGGS_FUSED_INT8 quantizes the batched path too,
                        # but only at large batch: +28% at B=2048, measured
                        # WORSE at B<=32 (latency-bound steps; the per-step
                        # activation-quant VPU work isn't amortized)
                        quantize_int8=(
                            self._quantize_batched and speech_enc.shape[0] >= 256
                        ),
                    )
                # rot6d -> quaternion ON DEVICE: BVH export needs quats, and
                # converting here (a) fuses into the rollout program, (b)
                # shrinks the device->host transfer by a third (J*4 vs J*6
                # floats), (c) removes the per-clip host-CPU conversion that
                # dominated serving writes (measured ~190 ms/clip -> ~45 ms)
                lrot = quat.from_xform(xform.orthogonalize_from_xy(out[3]))
                out = out[:3] + (lrot,)
                if self._transfer_dtype is not None:
                    out = tuple(o.astype(self._transfer_dtype) for o in out)
                return out

            self._rollout_cache[n_frames] = fn
        return self._rollout_cache[n_frames]

    # -- feature helpers ---------------------------------------------------

    def audio_to_features(self, audio_file):
        _, audio = wav.read_wavfile(
            audio_file, rescale=True, desired_fs=self.mel_cfg.sampling_rate,
            desired_nb_channels=None, out_type="float32",
        )
        n_frames = int(round(60.0 * (len(audio) / self.mel_cfg.sampling_rate)))
        with host_cpu():
            feats = F.preprocess_audio(audio, 60, n_frames, self.mel_cfg, self.audio_feature_type)
        # return a HOST array: features are computed on host CPU anyway, and
        # consumers either feed them straight into a jitted encoder (which
        # uploads once) or assemble host-side batches — uploading here would
        # force a ~0.27 s device round-trip per clip in the serving path
        return np.asarray(feats), n_frames

    def style_example_from_bvh(self, path, frames=None):
        """BVH example -> (feature vec, AnimFeatures). Cached by (path,
        mtime, frames): serving workloads reuse a small set of style clips
        across many requests, and the host-side FK featurization is the
        expensive part (~25 ms per 512-frame example)."""
        key = (str(path), Path(path).stat().st_mtime_ns, tuple(frames) if frames else None)
        hit = self._style_cache.get(key)
        if hit is not None:
            return hit
        anim = bvh.load(path)
        if frames is not None:
            anim["rotations"] = anim["rotations"][frames[0] : frames[1]]
            anim["positions"] = anim["positions"][frames[0] : frames[1]]
        fps = int(np.ceil(1.0 / anim["frametime"]))
        assert fps == 60, f"style example must be 60 fps, got {fps}"
        with host_cpu():
            feats = F.preprocess_animation(anim)
            vec = pose.example_feature_vec(
                feats.root_vel, feats.root_vrt, feats.lpos, feats.ltxy, feats.lvel, feats.lvrt
            )
        if len(self._style_cache) >= 128:
            self._style_cache.pop(next(iter(self._style_cache)))
        self._style_cache[key] = (vec, feats)
        return vec, feats

    def encode_style(self, example_vec, temperature=1.0, rng=None):
        """Pad the (L, 1134) example to a length bucket and encode."""
        Lt = example_vec.shape[0]
        bucket = max(64, _round_up(Lt, 64))
        padded = jnp.zeros((bucket, example_vec.shape[1]), example_vec.dtype)
        padded = padded.at[:Lt].set(example_vec)
        if temperature <= 0.0:
            return self._encode_style_det(padded, Lt)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._encode_style_stoch(padded, Lt, jnp.float32(temperature), rng)

    def label_encoding(self, label):
        idx = self.label_names.index(label)
        one_hot = np.zeros((1, len(self.label_names)), np.float32)
        one_hot[0, idx] = 1.0
        return one_hot  # host array; consumers upload (or stack) as needed

    def encode_styles_batch(self, jobs):
        """Encode many style examples in ONE jitted call per length bucket.

        jobs: list of (vec (L, D) np, temperature, key (2,) uint32 np).
        Returns a list of (1, C) np encodings, bit-equal to calling
        `encode_style` per job (same masks, same per-key eps draws). The
        serving path uses this to replace N tunnel dispatches with one
        per length bucket."""
        if not jobs:
            return []
        out = [None] * len(jobs)
        buckets = {}
        for i, (vec, _t, _k) in enumerate(jobs):
            Lb = max(64, _round_up(vec.shape[0], 64))
            buckets.setdefault(Lb, []).append(i)
        from .batch import resolve_batch_pad

        # batch-size policy mirrors the rollout chunks (batch.py): on TPU
        # the encoder at N<=32 is latency-bound, so fixed 32-wide chunks
        # give ONE program per length bucket (each extra program costs
        # minutes cold / ~10 s warm through a remote-compile tunnel); on
        # CPU pow2 keeps padded compute proportional to real work
        full = resolve_batch_pad("auto") == "full"
        staged = []
        for Lb, idxs in sorted(buckets.items()):
            chunks = ([idxs[s:s + 32] for s in range(0, len(idxs), 32)]
                      if full else [idxs])
            for cidxs in chunks:
                N = len(cidxs)
                Np = 32 if full else max(8, 1 << (N - 1).bit_length())
                D = jobs[cidxs[0]][0].shape[1]
                padded = np.zeros((Np, Lb, D), np.float32)
                lengths = np.ones((Np,), np.int32)
                temps = np.zeros((Np,), np.float32)
                keys = np.zeros((Np, 2), np.uint32)
                for j, i in enumerate(cidxs):
                    vec, t, k = jobs[i]
                    padded[j, : vec.shape[0]] = vec
                    lengths[j] = vec.shape[0]
                    temps[j] = t
                    keys[j] = k
                emb = self._encode_styles_many(
                    jnp.asarray(padded), jnp.asarray(lengths),
                    jnp.asarray(temps), jnp.asarray(keys),
                )
                staged.append((cidxs, emb))
        pulled = jax.device_get([e for _, e in staged])
        for (idxs, _), emb in zip(staged, pulled):
            for j, i in enumerate(idxs):
                out[i] = np.asarray(emb[j : j + 1])
        return out

    # -- rollout ----------------------------------------------------------

    def rollout(self, first_pose_feats, gaze_pos, speech_enc, style_enc, bucket=64):
        """Single-clip rollout; inputs (1, T, ...). Returns stacked
        (root_pos, root_rot, lpos, lrot) trajectories (1, T, ...), joint
        rotations already converted to quaternions on device.

        T is padded up to a multiple of ``bucket`` (edge-repeated
        conditioning) and the result sliced back: the decoder is causal, so
        frames < T are unaffected, and the jit cache stays bounded instead
        of compiling one program per distinct clip length."""
        f = first_pose_feats
        state0 = (
            jnp.asarray(f.root_pos[0])[None],
            jnp.asarray(f.root_rot[0])[None],
            jnp.asarray(f.root_vel[0])[None],
            jnp.asarray(f.root_vrt[0])[None],
            jnp.asarray(f.lpos[0])[None],
            jnp.asarray(f.ltxy[0])[None],
            jnp.asarray(f.lvel[0])[None],
            jnp.asarray(f.lvrt[0])[None],
        )
        n = speech_enc.shape[1]
        T_pad = max(bucket, _round_up(n, bucket))
        if T_pad != n:
            def pad_time(x):
                return jnp.concatenate(
                    [x, jnp.repeat(x[:, -1:], T_pad - n, axis=1)], axis=1
                )

            gaze_pos = pad_time(gaze_pos)
            speech_enc = pad_time(speech_enc)
            style_enc = pad_time(style_enc)
        out = self._rollout_fn(T_pad)(state0, gaze_pos, speech_enc, style_enc)
        if T_pad != n:
            out = tuple(o[:, :n] for o in out)
        return out

    def streaming_session(self, styles, first_pose=None, blend_ratio=(0.5, 0.5),
                          temperature=1.0, seed=1234, gain=1.0, quantum=1):
        """Open a StreamingSession: push audio chunks, pull gesture frames
        as they become computable (see infer/streaming.py). Net-new vs the
        offline reference; emits exactly the offline frames."""
        from .streaming import StreamingSession

        return StreamingSession(
            self, styles, first_pose=first_pose, blend_ratio=blend_ratio,
            temperature=temperature, seed=seed, gain=gain, quantum=quantum,
        )

    def write_result(self, results_path, file_name, rollout_out, audio_file=None):
        results_path = Path(results_path)
        results_path.mkdir(exist_ok=True, parents=True)
        # ONE batched pull for all four trajectories: serial np.asarray
        # round-trips cost ~0.27 s each through the device tunnel. Upcast
        # to fp32 on host — the re-anchoring/Euler math must not run in a
        # reduced transfer dtype.
        o_root_pos, o_root_rot, o_lpos, o_last = (
            np.asarray(a, np.float32)
            for a in jax.device_get(rollout_out[:4])
        )
        if o_last.ndim == 5:  # (1, T, J, 2, 3) rot6d — convert on host
            with host_cpu():
                lrot = _ltxy_to_quat(jnp.asarray(o_last))
        else:  # (1, T, J, 4): already quaternions (device-converted rollout)
            lrot = o_last
        out_file = results_path / (file_name + ".bvh")
        write_bvh(
            str(out_file),
            np.asarray(o_root_pos[0]),
            np.asarray(o_root_rot[0]),
            np.asarray(o_lpos[0]),
            np.asarray(lrot[0]),
            parents=self.parents,
            names=self.bone_names,
            order="zyx",
            dt=self.dt,
            start_position=np.array([0.0, 0.0, 0.0]),
            start_rotation=np.array([1.0, 0.0, 0.0, 0.0]),
        )
        if audio_file is not None:
            copyfile(audio_file, results_path / (file_name + ".wav"))
        return out_file


def generate_gesture(
    audio_file,
    styles,
    network_path,
    data_path,
    results_path,
    style_encoding_type="example",
    blend_type="add",
    blend_ratio=(0.5, 0.5),
    file_name=None,
    first_pose=None,
    temperature=1.0,
    seed=1234,
    use_gpu=True,  # accepted for API parity; device choice is jax-global
    use_script=False,  # accepted for API parity; everything is jit-compiled
    pipeline=None,
):
    """Generate stylized gesture from raw audio + style spec.

    Mirrors generate.py:22-411 argument-for-argument; returns the final
    style encoding ((1, C) for "add", (1, T, C) for "stitch", or the list of
    per-style encodings when audio_file is None with stitch).
    """
    del use_gpu, use_script
    pipe = pipeline or GesturePipeline(
        Path(network_path), Path(data_path), style_encoding_type=style_encoding_type
    )
    rng = jax.random.PRNGKey(seed)

    assert (audio_file is None) == (results_path is None)

    speech_enc = None
    n_frames = None
    if audio_file is not None:
        audio_features, n_frames = pipe.audio_to_features(audio_file)
        speech_enc = pipe._encode_speech(audio_features)

    style_encodings = []
    anim_name = None
    last_feats = None
    for style in styles:
        if style_encoding_type == "example":
            if isinstance(style, (tuple, list)) and isinstance(style[0], (str, Path)):
                anim_name = Path(style[0]).stem
                vec, feats = pipe.style_example_from_bvh(style[0], style[1])
                last_feats = feats
                rng, sub = jax.random.split(rng)
                emb, _, _ = pipe.encode_style(vec, temperature, sub)
                style_encodings.append(emb)
            elif isinstance(style, (tuple, list)) and isinstance(style[0], np.ndarray):
                anim_name = style[1]
                style_encodings.append(jnp.asarray(style[0], jnp.float32)[None])
            elif isinstance(style, np.ndarray):
                style_encodings.append(jnp.asarray(style, jnp.float32)[None])
            else:
                raise ValueError(f"bad style spec {style!r}")
        elif style_encoding_type == "label":
            anim_name = style
            style_encodings.append(pipe.label_encoding(style))
            assert first_pose is not None, "label styles require first_pose"
        else:
            raise ValueError(f"unknown style encoding type {style_encoding_type!r}")

    # --- blend (generate.py:280-308) ---
    if blend_type == "stitch":
        if len(style_encodings) > 1:
            if audio_file is None:
                final_style = style_encodings
            else:
                assert len(styles) == len(blend_ratio)
                se = split_by_ratio(n_frames, list(blend_ratio))
                parts = [
                    jnp.repeat(enc[:, None], se_i[1] - se_i[0], axis=1)
                    for enc, se_i in zip(style_encodings, se)
                ]
                final_style = jnp.concatenate(parts, axis=1)  # (1, T, C)
        else:
            final_style = style_encodings[0]
    elif blend_type == "add":
        if len(style_encodings) > 1:
            assert len(style_encodings) == len(blend_ratio)
            stacked = jnp.stack(style_encodings, axis=1)  # (1, n, C)
            final_style = jnp.einsum("bnc,n->bc", stacked, jnp.asarray(blend_ratio, jnp.float32))
        else:
            final_style = style_encodings[0]
    else:
        raise ValueError(f"unknown blend type {blend_type!r}")

    if audio_file is None:
        return final_style

    # --- first pose (generate.py:313-354) ---
    if first_pose is not None:
        if isinstance(first_pose, (str, Path)):
            anim = bvh.load(first_pose)
        else:
            anim = dict(first_pose)
        from ..utils import host_cpu as _host_cpu

        with _host_cpu():
            feats0 = F.preprocess_animation(anim)
    else:
        feats0 = last_feats
        assert feats0 is not None, "no first pose available"

    gaze = jnp.broadcast_to(jnp.asarray(feats0.gaze_pos[0]), (n_frames, 3))[None]
    style_t = (
        final_style
        if final_style.ndim == 3
        else jnp.repeat(final_style[:, None], n_frames, axis=1)
    )
    out = pipe.rollout(feats0, gaze, speech_enc, style_t)

    if file_name is None:
        file_name = f"audio_{Path(audio_file).stem}_label_{anim_name}"
    pipe.write_result(results_path, file_name, out, audio_file)
    return final_style
