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


def resolve_batch_pad(batch_pad):
    """Resolve the chunk batch-padding policy.

    "pow2": pad each chunk's batch to the next power of two — partial tail
    chunks reuse a small ladder of compiled programs. Right for backends
    where compute scales with B (CPU).
    "full": pad EVERY chunk to ``max_batch`` — ONE program per length
    bucket. On TPU a B<=64 rollout is weight/latency-bound, not
    compute-bound (the decoder weights VMEM-resident across the scan, the
    per-step matmuls tiny), so padding to full batch costs ~nothing on
    device while collapsing the compile/warmup set ~6x — each extra
    serving program costs minutes cold and ~10 s warm through a
    remote-compile tunnel.
    "auto": "full" on TPU, "pow2" elsewhere.
    """
    if batch_pad == "auto":
        return "full" if jax.default_backend() == "tpu" else "pow2"
    assert batch_pad in ("pow2", "full"), batch_pad
    return batch_pad


def _chunk_b_pad(B, max_batch, n_dev, batch_pad):
    """Padded batch size for a chunk of B requests under the policy."""
    if batch_pad == "full":
        return _round_up(max_batch, n_dev)
    B_pad = max(n_dev, 1 << (B - 1).bit_length())
    B_pad = _round_up(min(B_pad, max_batch), n_dev)
    return max(B_pad, _round_up(B, n_dev))


def plan_programs(lengths, bucket=512, max_batch=64, n_dev=1, batch_pad="auto"):
    """Predict the (T_pad, B_pad) rollout program shapes
    :func:`generate_batch` will execute for clips of these lengths (frames).

    Mirrors the bucketing/chunking below exactly; used by :func:`warmup`
    and by operators sizing a serving deployment's compile budget."""
    batch_pad = resolve_batch_pad(batch_pad)
    buckets = {}
    for n in lengths:
        T_pad = max(bucket, _round_up(int(n), bucket))
        buckets.setdefault(T_pad, []).append(n)
    plan = []
    for T_pad, items in sorted(buckets.items()):
        for chunk_start in range(0, len(items), max_batch):
            B = len(items[chunk_start : chunk_start + max_batch])
            plan.append((T_pad, _chunk_b_pad(B, max_batch, n_dev, batch_pad)))
    return sorted(set(plan))


def warmup(pipe, lengths, bucket=512, max_batch=64, mesh=None,
           style_jobs=None, all_pow2=False, deadline=None, log=None,
           batch_pad="auto"):
    """Pre-compile the serving programs for clips of the given lengths.

    Runs each (speech-encode, rollout) program pair ONCE on zero inputs —
    one program at a time, checking ``deadline`` (a ``time.monotonic``
    value) between programs — so every finished compile lands in the
    in-process jit cache AND the persistent compile cache even when a later
    one is cut off. Through a remote-compile tunnel each cold program costs
    minutes; any source edit inside the jitted rollout invalidates every
    bucket at once, so serving deployments (and the driver bench) run this
    preflight before taking traffic.

    all_pow2: also warm every power-of-two batch size up to ``max_batch``
    per length bucket — the shapes a micro-batching daemon's partial drains
    produce (serve/server.py) under the "pow2" policy, beyond the
    full-batch plan. A no-op under the "full" policy, where every drain
    pads to ONE program per length bucket.
    style_jobs: optional list of (example_len, count) to warm the batched
    style-encoder programs used by ``encode_styles_batch``.
    batch_pad: chunk batch-padding policy (see :func:`resolve_batch_pad`);
    must match what generate_batch / the daemon will run with.

    Returns {"compiled": [(T_pad, B_pad), ...], "skipped": [...],
    "seconds": total, "complete": bool} — ``skipped`` names the programs a
    caller must avoid (drop requests whose T_pad never compiled)."""
    import time

    n_dev = mesh.devices.size if mesh is not None else 1
    batch_pad = resolve_batch_pad(batch_pad)
    plan = plan_programs(lengths, bucket=bucket, max_batch=max_batch,
                         n_dev=n_dev, batch_pad=batch_pad)
    if all_pow2 and batch_pad == "pow2":
        t_pads = {t for t, _ in plan}
        pow2s = []
        b = max(1, n_dev)
        while b <= max_batch:
            pow2s.append(b)
            b *= 2
        extra = [(t, b) for t in sorted(t_pads) for b in pow2s]
        # plan programs first (they serve the known traffic), then the
        # daemon's partial-drain shapes, cheapest (smallest) first
        plan = plan + sorted(set(extra) - set(plan))

    J = pipe.njoints
    n_audio = int(pipe.stats["audio_input_mean"].shape[0])
    C = pipe.style_encoding_size
    sharding = None
    if mesh is not None:
        from ..parallel import batch_sharding

        sharding = batch_sharding(mesh)

    t_start = time.monotonic()
    compiled, skipped = [], []

    def expired():
        return deadline is not None and time.monotonic() >= deadline

    for T_pad, B_pad in plan:
        if expired():
            skipped.append((T_pad, B_pad))
            continue
        t0 = time.monotonic()
        q = np.zeros((B_pad, 4), np.float32)
        q[:, 0] = 1.0
        ltxy = np.zeros((B_pad, J, 2, 3), np.float32)
        ltxy[..., 0, 0] = 1.0
        ltxy[..., 1, 1] = 1.0
        state0 = (
            jnp.zeros((B_pad, 3)), jnp.asarray(q), jnp.zeros((B_pad, 3)),
            jnp.zeros((B_pad, 3)), jnp.zeros((B_pad, J, 3)), jnp.asarray(ltxy),
            jnp.zeros((B_pad, J, 3)), jnp.zeros((B_pad, J, 3)),
        )
        speech = pipe._encode_speech_batched(
            jnp.zeros((B_pad, T_pad, n_audio), jnp.float32))
        args = (state0, jnp.zeros((B_pad, T_pad, 3)), speech,
                jnp.zeros((B_pad, T_pad, C)))
        if sharding is not None:
            args = jax.tree.map(lambda x: jax.device_put(x, sharding), args)
        jax.block_until_ready(pipe._rollout_fn(T_pad)(*args))
        if log:
            log(f"warm rollout T={T_pad} B={B_pad}: "
                f"{time.monotonic() - t0:.1f}s")
        compiled.append((T_pad, B_pad))

    for L, count in (style_jobs or []):
        if expired():
            # record the cut so "complete" can't claim style programs were
            # warmed when the deadline landed between the two loops
            skipped.append(("style", int(L), int(count)))
            continue
        t0 = time.monotonic()
        key = np.zeros(2, np.uint32)
        # example feature vec = pose input incl. the zeroed gaze slot
        # (modules.py:699-710 layout; pose.example_feature_vec)
        jobs = [(np.zeros((int(L), 6 + J * 15 + 3), np.float32), 1.0, key)
                for _ in range(int(count))]
        pipe.encode_styles_batch(jobs)
        if log:
            log(f"warm style-encode L={L} N={count}: "
                f"{time.monotonic() - t0:.1f}s")

    return {
        "compiled": compiled,
        "skipped": skipped,
        "seconds": round(time.monotonic() - t_start, 1),
        "complete": not skipped,
    }


def _prepare_host(pipe, req: Request):
    """Host-only prep for one request: audio features, style-encode JOBS
    (deferred to one batched device call), first pose. No tunnel
    dispatches — the per-request PRNG key derivation runs on the host CPU
    backend and reproduces the single-clip path's split sequence exactly."""
    from ..utils import host_cpu

    audio_features, n_frames = pipe.audio_to_features(req.audio)

    specs = []  # ("job", local_index) | ("const", (1, C) np)
    jobs = []  # (vec, temperature, key) for encode_styles_batch
    feats = None
    with host_cpu():
        rng = jax.random.PRNGKey(req.seed)
        for style in req.styles:
            if isinstance(style, (tuple, list)) and isinstance(style[0], (str, Path)):
                vec, feats = pipe.style_example_from_bvh(style[0], style[1])
                rng, sub = jax.random.split(rng)
                jobs.append((np.asarray(vec), req.temperature, np.asarray(sub)))
                specs.append(("job", len(jobs) - 1))
            elif isinstance(style, np.ndarray):
                specs.append(("const", np.asarray(style, np.float32)[None]))
            else:  # label
                specs.append(("const", np.asarray(pipe.label_encoding(style))))

        if req.first_pose is not None:
            from ..data import features as F
            from ..io import bvh

            feats = F.preprocess_animation(bvh.load(req.first_pose))
    assert feats is not None, f"{req.file_name}: no first pose available"
    return audio_features, n_frames, specs, jobs, feats


def _blend_host(req: Request, encodings, n_frames):
    """Blend per-style (1, C) encodings on host (generate.py:280-308
    semantics): returns (1, C) for "add" or (1, n_frames, C) for
    "stitch"."""
    if len(encodings) <= 1:
        return np.asarray(encodings[0], np.float32)
    if req.blend_type == "stitch":
        from ..utils import split_by_ratio

        spans = split_by_ratio(n_frames, list(req.blend_ratio))
        parts = [
            np.repeat(enc[:, None], span[1] - span[0], axis=1)
            for enc, span in zip(encodings, spans)
        ]
        return np.concatenate(parts, axis=1)
    ratio = np.asarray(req.blend_ratio, np.float32)
    return np.einsum(
        "nbc,n->bc", np.concatenate([e[None] for e in encodings]), ratio
    )


def generate_batch(
    pipe,
    requests,
    results_path,
    bucket=512,
    max_batch=64,
    mesh=None,
    write_workers=4,
    batch_pad="auto",
):
    """Run many requests as bucketed batched rollouts.

    pipe: GesturePipeline. Returns the list of written BVH paths.
    batch_pad: chunk batch-padding policy (see :func:`resolve_batch_pad`).
    """
    batch_pad = resolve_batch_pad(batch_pad)
    results_path = Path(results_path)
    results_path.mkdir(parents=True, exist_ok=True)

    # prep stays SERIAL deliberately: threading it was measured 0.45 s
    # WORSE on the 20-clip bench (device-queue contention disrupted the
    # downstream dispatch pipelining). It is host-only work: the style
    # encodes are deferred into ONE batched jit call per length bucket
    # below, instead of one tunnel dispatch per request.
    host_prepped = [(req, *_prepare_host(pipe, req)) for req in requests]

    all_jobs = []
    offsets = []
    for (_req, _af, _n, _specs, jobs, _fp) in host_prepped:
        offsets.append(len(all_jobs))
        all_jobs.extend(jobs)
    encoded = pipe.encode_styles_batch(all_jobs)

    # Pull anything device-resident for host-side batch assembly in ONE
    # transfer (a pull through the tunnel costs ~0.27 s of latency EACH
    # regardless of size; with the host-pinned featurizers this is
    # normally a no-op).
    state_attrs = ("root_pos", "root_rot", "root_vel", "root_vrt",
                   "lpos", "ltxy", "lvel", "lvrt")
    pulled = jax.device_get([
        (af, tuple(getattr(fp, a) for a in state_attrs), fp.gaze_pos)
        for (req, af, n, specs, jobs, fp) in host_prepped
    ])
    prepared = []
    for ((req, _, n, specs, _, _), off, (af, st, gz)) in zip(
        host_prepped, offsets, pulled
    ):
        encs = [
            encoded[off + s[1]] if s[0] == "job" else s[1] for s in specs
        ]
        se = _blend_host(req, encs, n)
        prepared.append(
            (req, np.asarray(af), n, se[0],
             tuple(np.asarray(s)[0] for s in st), np.asarray(gz)[0])
        )

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
                # pad the chunk batch so partial tails reuse compiled
                # programs instead of compiling one per distinct B
                # (minutes each on TPU) — policy in resolve_batch_pad
                B_pad = _chunk_b_pad(B, max_batch, n_dev, batch_pad)

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
