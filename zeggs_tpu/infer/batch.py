"""Batched multi-clip inference: the TPU serving path.

The reference CSV mode generates clips strictly one at a time
(generate.py:476-505). Here requests are bucketed by padded length, rolled
out as ONE batched scan per bucket (sharded on the batch axis over the
device mesh when one is provided), and BVH serialization runs on a host
thread pool overlapped with the next bucket's device compute — the
BASELINE.json north-star serving design.

Length padding is exact for the speech encoder: features are edge-repeated,
which coincides with the encoder's replicate padding at the true clip end;
rollout frames beyond a clip's true length are computed and discarded.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import batch_sharding


@dataclass
class Request:
    """One synthesis request (mirrors an evaluation CSV row,
    data/test/evaluation_example_based.csv)."""

    audio: Path
    styles: Sequence  # same forms as generate_gesture styles
    file_name: str
    temperature: float = 1.0
    seed: int = 1234
    first_pose: Optional[Path] = None
    frames: Optional[tuple] = None  # style example frame range
    blend_type: str = "add"  # "add" (mix) or "stitch" (transitions)
    blend_ratio: Sequence[float] = field(default_factory=lambda: [0.5, 0.5])


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _prepare(pipe, req: Request):
    """Host+device prep for one request: features, encodings, first pose."""
    audio_features, n_frames = pipe.audio_to_features(req.audio)
    rng = jax.random.PRNGKey(req.seed)

    encodings = []
    feats = None
    for style in req.styles:
        if isinstance(style, (tuple, list)) and isinstance(style[0], (str, Path)):
            vec, feats = pipe.style_example_from_bvh(style[0], style[1])
            rng, sub = jax.random.split(rng)
            emb, _, _ = pipe.encode_style(vec, req.temperature, sub)
            encodings.append(emb)
        elif isinstance(style, np.ndarray):
            encodings.append(jnp.asarray(style, jnp.float32)[None])
        else:  # label
            encodings.append(pipe.label_encoding(style))
    if len(encodings) > 1:
        if req.blend_type == "stitch":
            # per-frame transitions (generate.py:280-298): each style owns a
            # contiguous share of the clip; returns (1, n_frames, C)
            from ..utils import split_by_ratio

            spans = split_by_ratio(n_frames, list(req.blend_ratio))
            parts = [
                jnp.repeat(enc[:, None], span[1] - span[0], axis=1)
                for enc, span in zip(encodings, spans)
            ]
            style_enc = jnp.concatenate(parts, axis=1)
        else:
            ratio = jnp.asarray(req.blend_ratio, jnp.float32)
            style_enc = jnp.einsum(
                "nbc,n->bc", jnp.concatenate([e[None] for e in encodings]), ratio
            )
    else:
        style_enc = encodings[0]

    if req.first_pose is not None:
        from ..data import features as F
        from ..io import bvh
        from ..utils import host_cpu

        with host_cpu():
            feats = F.preprocess_animation(bvh.load(req.first_pose))
    assert feats is not None, f"{req.file_name}: no first pose available"
    return audio_features, n_frames, style_enc, feats


def generate_batch(
    pipe,
    requests,
    results_path,
    bucket=512,
    max_batch=64,
    mesh=None,
    write_workers=4,
):
    """Run many requests as bucketed batched rollouts.

    pipe: GesturePipeline. Returns the list of written BVH paths.
    """
    results_path = Path(results_path)
    results_path.mkdir(parents=True, exist_ok=True)

    # prep stays SERIAL deliberately: threading it was measured 0.45 s
    # WORSE on the 20-clip bench — _prepare's jitted style encodes contend
    # on the serialized device queue and disrupt the downstream dispatch
    # pipelining, outweighing the numpy featurization overlap
    prepared = [(req, *_prepare(pipe, req)) for req in requests]

    # Pull everything host-side batch assembly needs in ONE batched
    # transfer. A device->host pull through the tunnel costs ~0.27 s of
    # latency EACH regardless of size (measured), so the per-item
    # np.asarray calls this replaces cost ~9 s for a 20-clip workload.
    state_attrs = ("root_pos", "root_rot", "root_vel", "root_vrt",
                   "lpos", "ltxy", "lvel", "lvrt")
    pulled = jax.device_get([
        (af, se, tuple(getattr(fp, a) for a in state_attrs), fp.gaze_pos)
        for (req, af, n, se, fp) in prepared
    ])
    prepared = [
        (req, np.asarray(af), n, np.asarray(se)[0],
         tuple(np.asarray(s)[0] for s in st), np.asarray(gz)[0])
        for ((req, _, n, _, _), (af, se, st, gz)) in zip(prepared, pulled)
    ]

    # bucket by padded length
    buckets = {}
    for item in prepared:
        T_pad = max(bucket, _round_up(item[2], bucket))
        buckets.setdefault(T_pad, []).append(item)

    sharding = batch_sharding(mesh) if mesh is not None else None
    n_dev = mesh.devices.size if mesh is not None else 1

    written = []
    # Pipelined dispatch: device work + host->device uploads + async
    # device->host copies all overlap. A chunk's outputs are only
    # collected (and handed to the writer pool) after at least one more
    # chunk has been dispatched, so the device never idles waiting on the
    # tunnel; `pipeline_depth` bounds outputs held in HBM.
    pipeline_depth = 2
    pending = []
    with ThreadPoolExecutor(max_workers=write_workers) as pool:
        futures = []

        def collect(entry):
            chunk, out = entry
            host = jax.device_get(out)  # async copies already in flight
            for i, (req, af, n, se, st, gz) in enumerate(chunk):
                futures.append(
                    pool.submit(
                        _write_one, pipe, results_path, req,
                        tuple(h[i : i + 1, :n] for h in host),
                    )
                )

        for T_pad, items in sorted(buckets.items()):
            for chunk_start in range(0, len(items), max_batch):
                chunk = items[chunk_start : chunk_start + max_batch]
                B = len(chunk)
                B_pad = _round_up(B, n_dev)

                def stack_state(j):
                    arrs = [c[4][j] for c in chunk]
                    arrs += [arrs[-1]] * (B_pad - B)
                    return jnp.asarray(np.stack(arrs))

                state0 = tuple(stack_state(j) for j in range(len(state_attrs)))
                feats_dim = chunk[0][1].shape[-1]
                audio = np.zeros((B_pad, T_pad, feats_dim), np.float32)
                gaze = np.zeros((B_pad, T_pad, 3), np.float32)
                style = np.zeros((B_pad, T_pad, chunk[0][3].shape[-1]), np.float32)
                for i, (req, af, n, se, st, gz) in enumerate(chunk):
                    audio[i, :n] = af[:n]
                    audio[i, n:] = af[n - 1]  # edge-repeat == replicate pad
                    gaze[i] = gz
                    if se.ndim == 2:  # per-frame ("stitch") encodings
                        style[i, :n] = se[:n]
                        style[i, n:] = se[n - 1]
                    else:
                        style[i] = se

                speech = pipe._encode_speech_batched(jnp.asarray(audio))
                args = (state0, jnp.asarray(gaze), speech, jnp.asarray(style))
                if sharding is not None:
                    args = jax.tree.map(lambda x: jax.device_put(x, sharding), args)
                out = pipe._rollout_fn(T_pad)(*args)[:4]
                for o in out:  # start the device->host copies now
                    o.copy_to_host_async()
                pending.append((chunk, out))
                if len(pending) > pipeline_depth:
                    collect(pending.pop(0))
        for entry in pending:
            collect(entry)
        for f in futures:
            written.append(f.result())
    return written


def _write_one(pipe, results_path, req, host_slices):
    out_file = pipe.write_result(results_path, req.file_name, host_slices, req.audio)
    return out_file
