"""Corpus preparation pipeline: raw BVH+WAV clips -> processed training data.

Reference semantics: ZEGGS/data_pipeline.py:234-736 — per clip: load, mask
non-speaker audio regions from per-clip CSVs, clap-timecode sync + trim,
time-stretch augmentation (len_ratios), audio + animation feature
extraction; then corpus statistics (per-dim means, per-group scalar input
stds, per-dim output stds) and the processed_data.npz / stats.npz /
data_definition.json artifacts.

TPU-first design: clips are embarrassingly parallel — they are mapped over a
process pool on each host, and across hosts each `jax.process_index` takes a
strided shard of the clip list (the reference is strictly serial). Feature
math runs on the shared jnp core.
"""

from __future__ import annotations

import csv
import json
import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np
from scipy.interpolate import griddata

from ..config import PipelineConfig
from ..io import bvh, wav
from ..ops import quat
from . import features as F

_FEATURE_ORDER = (
    "root_pos", "root_rot", "root_vel", "root_vrt",
    "lpos", "ltxy", "lvel", "lvrt", "gaze_pos", "gaze_dir",
)


# ---------------------------------------------------------------------------
# timecode / silencing helpers
# ---------------------------------------------------------------------------

def timecode_to_thirds(tc, frames_scale):
    """'(H):(M):(S):(F)' -> 1/60-second "thirds"; audio timecodes are 30 fps
    (frame scale 2), animation 60 fps (scale 1) — data_pipeline.py:345-372."""
    h, m, s, f = (int(x) for x in tc.rsplit(":"))
    return h * 216000 + m * 3600 + s * 60 + f * frames_scale


def speaker_mask(timing_rows, n_samples, fs):
    """Boolean keep-mask over audio samples from speaker-timing rows
    ('#', 'Start', 'End' with 'M:S.ms') — data_pipeline.py:307-332."""
    mask = np.zeros(n_samples, np.float32)
    for row in timing_rows:
        if "R" not in str(row["#"]):
            continue
        def to_samples(val):
            parts = [int(x) for x in str(val).replace(".", ":").rsplit(":")]
            minutes, seconds, ms = parts
            return minutes * 60 * fs + seconds * fs + int(ms * (fs / 1000))
        mask[to_samples(row["Start"]) : to_samples(row["End"])] = 1.0
    return mask


def sync_trim(anim_data, audio_data, info_row, audio_sr, anim_fps):
    """Clap-time sync + trim both streams to the acting range
    (data_pipeline.py:334-411)."""
    audio_start = timecode_to_thirds(info_row["audio_start_time"], 2)
    anim_start = timecode_to_thirds(info_row["anim_start_time"], 1)
    act_start = timecode_to_thirds(info_row["acting_start_time"], 1)
    act_end = timecode_to_thirds(info_row["acting_end_time"], 1)

    a0 = int(np.round((act_start - audio_start) * (audio_sr / 60)))
    a1 = int(np.round((act_end - audio_start) * (audio_sr / 60)))
    m0 = int(np.round((act_start - anim_start) * (anim_fps / 60)))
    m1 = int(np.round((act_end - anim_start) * (anim_fps / 60)))
    if min(a0, a1, m0, m1) < 0:
        raise ValueError("The timings are incorrect!")
    audio_data = audio_data[a0:a1]
    anim_data = dict(anim_data)
    anim_data["rotations"] = anim_data["rotations"][m0:m1]
    anim_data["positions"] = anim_data["positions"][m0:m1]
    return anim_data, audio_data


def time_stretch(anim_data, audio_data, len_ratio):
    """Cubic time-stretch of positions, unrolled quats, and raw audio
    (data_pipeline.py:412-433)."""
    if len_ratio == 1.0:
        return dict(anim_data), np.array(audio_data)
    anim = dict(anim_data)
    n = len(anim["rotations"])
    nbones = anim["positions"].shape[1]
    t_orig = np.linspace(0, n - 1, n)
    t_new = np.linspace(0, n - 1, int(len_ratio * n))
    anim["positions"] = griddata(
        t_orig, anim["positions"].reshape(n, -1), t_new, method="cubic"
    ).reshape(len(t_new), nbones, 3)
    rots = np.asarray(quat.unroll(quat.from_euler(np.radians(anim["rotations"]), anim["order"])))
    rots = griddata(t_orig, rots.reshape(n, -1), t_new, method="cubic").reshape(
        len(t_new), nbones, 4
    )
    rots = np.asarray(quat.normalize(rots))
    anim["rotations"] = np.degrees(np.asarray(quat.to_euler(rots, order=anim["order"])))

    na = len(audio_data)
    ta_orig = np.linspace(0, na - 1, na)
    ta_new = np.linspace(0, na - 1, int(len_ratio * na))
    audio = griddata(ta_orig, np.asarray(audio_data), ta_new, method="cubic")
    return anim, audio.astype(np.float32)


# ---------------------------------------------------------------------------
# per-clip processing
# ---------------------------------------------------------------------------

def process_clip(anim_data, audio_data, conf: PipelineConfig, anim_fps=60):
    """Features for one already-synced clip -> dict of float32 arrays."""
    audio_features = F.preprocess_audio(
        audio_data, anim_fps, len(anim_data["rotations"]), conf.audio_conf,
        feature_type=tuple(conf.audio_feature_type),
    )
    assert len(audio_features) == len(anim_data["rotations"])
    assert not np.any(np.isnan(audio_features))
    feats = F.preprocess_animation(anim_data)
    out = {"audio_features": np.asarray(audio_features, np.float32)}
    for k in _FEATURE_ORDER:
        out[k] = np.asarray(getattr(feats, k), np.float32)
    return out


def _worker_init():
    """Pin pipeline workers to the CPU backend (the TPU tunnel is
    single-client; see docs/DESIGN.md §7)."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _process_one(args):
    (i, row, base, conf_dict, anim_fps) = args
    conf = PipelineConfig.from_dict(conf_dict)
    original_path = Path(base) / "original"
    anim_data = bvh.load(original_path / row["anim_bvh"])
    fps = int(np.ceil(1.0 / anim_data["frametime"]))
    assert fps == anim_fps, f"expected {anim_fps} fps, got {fps}"

    audio_file = original_path / row["audio_filename"]
    audio_sr, audio_data = wav.read_wavfile(
        audio_file, rescale=True, desired_fs=conf.audio_conf.sampling_rate,
    )

    timing_csv = audio_file.with_suffix(".csv")
    if timing_csv.exists():
        with open(timing_csv, newline="") as f:
            timing_rows = list(csv.DictReader(f))
        audio_data = audio_data * speaker_mask(timing_rows, len(audio_data), audio_sr)

    if row.get("audio_start_time"):
        anim_data, audio_data = sync_trim(anim_data, audio_data, row, audio_sr, anim_fps)

    results = []
    for len_ratio in conf.len_ratios:
        anim_i, audio_i = time_stretch(anim_data, audio_data, float(len_ratio))
        clip = process_clip(anim_i, audio_i, conf, anim_fps)
        name = f"{Path(row['anim_bvh']).stem}_x_{str(len_ratio).replace('.', '_')}"
        if conf.save_normalized_animations or conf.visualize_gaze:
            feats = F.preprocess_animation(anim_i)
            dbg = Path(base) / conf.processed_data_path / "normalized_animations"
            if conf.save_normalized_animations:
                save_normalized_animations(anim_i, feats, dbg, name)
            if conf.visualize_gaze:
                dbg.mkdir(parents=True, exist_ok=True)
                visualize_gaze(feats, dbg / f"{name}_gaze.png")
        if conf.visualize_spectrogram:
            dbg = Path(base) / conf.processed_data_path / "normalized_animations"
            dbg.mkdir(parents=True, exist_ok=True)
            visualize_spectrogram(clip["audio_features"], dbg / f"{name}_spec.png")
        results.append(
            dict(
                clip=clip,
                style=row["style"],
                validation=str(row.get("validation", "FALSE")).upper() in ("TRUE", "1"),
                len_ratio=float(len_ratio),
                name=name,
                anim=anim_i if conf.save_trimmed_animation else None,
                audio=audio_i if conf.save_trimmed_audio else None,
                skeleton=dict(
                    parents=[int(p) for p in anim_data["parents"]],
                    names=list(anim_data["names"]),
                    dt=float(anim_data["frametime"]),
                ),
                index=i,
            )
        )
    return results


# ---------------------------------------------------------------------------
# corpus assembly
# ---------------------------------------------------------------------------

def compute_stats(processed, ranges_train):
    """Corpus statistics (data_pipeline.py:562-648): frames 2..-2 of every
    training range; per-dim means; per-group scalar input stds; per-dim
    output stds; scalar audio std."""
    mask = np.zeros(len(processed["audio_features"]), dtype=bool)
    for s, e in ranges_train:
        mask[s + 2 : e - 2] = True
    if not mask.any():
        # without this, np.mean over the empty selection writes NaN stats
        # that silently poison every downstream normalization
        raise ValueError(
            "compute_stats: no training frames — every clip is marked "
            "validation (or ranges are degenerate); cannot compute corpus "
            "statistics"
        )

    def flat(k):
        x = processed[k][mask]
        return x.reshape(len(x), -1)

    groups = ["root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"]
    means = {k: processed[k][mask].mean(axis=0) for k in groups + ["gaze_dir"]}
    scalar_stds = {k: processed[k][mask].std() + 1e-10 for k in groups + ["gaze_dir"]}
    out_stds = {k: processed[k][mask].std(axis=0) for k in groups}

    anim_input_mean = np.hstack([means[k].ravel() for k in groups + ["gaze_dir"]])
    anim_input_std = np.hstack(
        [np.repeat(scalar_stds[k], means[k].size) for k in groups + ["gaze_dir"]]
    )
    anim_output_mean = np.hstack([means[k].ravel() for k in groups])
    anim_output_std = np.hstack([out_stds[k].ravel() for k in groups])

    return dict(
        audio_input_mean=processed["audio_features"][mask].mean(axis=0),
        audio_input_std=processed["audio_features"][mask].std() + 1e-10,
        anim_input_mean=anim_input_mean.astype(np.float32),
        anim_input_std=anim_input_std,
        anim_output_mean=anim_output_mean.astype(np.float32),
        anim_output_std=anim_output_std.astype(np.float32),
    )


def data_pipeline(conf, num_workers=None, process_index=0, process_count=1):
    """Run the full corpus pipeline.

    ``process_index``/``process_count`` shard the clip list across hosts
    (per-host strided shard). When sharded, each host writes ONLY a
    per-shard clip archive (``pipeline_shard_<i>_of_<n>.npz``); the final
    artifacts — including corpus statistics, which must be *global*, not
    per-host — are produced by :func:`merge_shards` (run on one host after
    all shards exist). The merge restores the original info.csv clip order,
    so the sharded result is bit-identical to a serial run.
    Returns (processed_data, data_definition), or (None, None) in shard mode.
    """
    if not isinstance(conf, PipelineConfig):
        conf = PipelineConfig.from_dict(dict(conf))
    base = Path(conf.base_path)
    out_path = base / conf.processed_data_path
    out_path.mkdir(parents=True, exist_ok=True)

    (out_path / "data_pipeline_conf.json").write_text(json.dumps(conf.to_dict(), indent=4))

    with open(base / conf.info_filename, newline="") as f:
        rows = list(csv.DictReader(f))
    # keep GLOBAL row indices so a sharded run can be merged back into the
    # exact serial clip order
    indexed_rows = list(enumerate(rows))[process_index::process_count]

    tasks = [(i, row, str(base), conf.to_dict(), 60) for i, row in indexed_rows]
    if num_workers and num_workers > 1:
        # spawn (never fork an initialized XLA runtime) + CPU-only children:
        # per-clip feature math is host-parallel by design; the TPU stays
        # with the main process. Accelerator-plugin env triggers are stripped
        # so spawned children don't claim/contend for the device.
        ctx = multiprocessing.get_context("spawn")
        saved_env = {
            k: os.environ.pop(k, None)
            for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "TPU_NAME")
        }
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            with ProcessPoolExecutor(
                max_workers=num_workers, mp_context=ctx, initializer=_worker_init
            ) as pool:
                nested = list(pool.map(_process_one, tasks))
        finally:
            for k, v in saved_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    else:
        nested = [_process_one(t) for t in tasks]

    # flatten preserving clip order (then augmentation order)
    all_clips = [c for clip_list in nested for c in clip_list]

    if process_count > 1:
        _save_shard(out_path, all_clips, conf, process_index, process_count)
        return None, None

    return _assemble(all_clips, conf, out_path)


def _save_shard(out_path, all_clips, conf, process_index, process_count):
    """Persist this host's processed clips (arrays via the flattened-npz
    checkpoint format; per-clip metadata in the JSON meta blob). Trimmed
    debug artifacts are already written per clip during assembly on merge."""
    from ..io import checkpoint

    tree = {str(j): c["clip"] for j, c in enumerate(all_clips)}
    meta = [
        dict(
            style=c["style"], validation=bool(c["validation"]),
            len_ratio=c["len_ratio"], name=c["name"], index=int(c["index"]),
            skeleton=c["skeleton"],
            has_anim=c["anim"] is not None, has_audio=c["audio"] is not None,
        )
        for c in all_clips
    ]
    for j, c in enumerate(all_clips):
        if c["anim"] is not None:
            tree[str(j)] = dict(tree[str(j)])
            for k in ("rotations", "positions", "offsets"):
                tree[str(j)][f"__anim_{k}"] = np.asarray(c["anim"][k])
            meta[j]["anim_extra"] = dict(
                order=c["anim"]["order"], names=list(c["anim"]["names"]),
                parents=[int(p) for p in c["anim"]["parents"]],
                frametime=float(c["anim"]["frametime"]),
            )
        if c["audio"] is not None:
            tree[str(j)] = dict(tree[str(j)])
            tree[str(j)]["__audio"] = np.asarray(c["audio"])
    checkpoint.save(
        out_path / f"pipeline_shard_{process_index}_of_{process_count}.npz", tree, meta
    )


def merge_shards(conf, process_count):
    """Merge per-host shard archives into the final global artifacts.

    Clips are re-sorted by their original info.csv row index, so the merged
    processed_data/stats are bit-identical to a serial (unsharded) run —
    per-host statistics are never used (the reference computes stats over
    the whole corpus, data_pipeline.py:562-648).
    """
    from ..io import checkpoint

    if not isinstance(conf, PipelineConfig):
        conf = PipelineConfig.from_dict(dict(conf))
    out_path = Path(conf.base_path) / conf.processed_data_path

    entries = []
    for i in range(process_count):
        path = out_path / f"pipeline_shard_{i}_of_{process_count}.npz"
        tree, meta = checkpoint.load(path)
        for j, m in enumerate(meta):
            clip = dict(tree[str(j)])
            anim = audio = None
            if m.get("has_audio"):
                audio = clip.pop("__audio")
            if m.get("has_anim"):
                extra = m["anim_extra"]
                anim = dict(
                    rotations=clip.pop("__anim_rotations"),
                    positions=clip.pop("__anim_positions"),
                    offsets=clip.pop("__anim_offsets"),
                    order=extra["order"], names=extra["names"],
                    parents=extra["parents"], frametime=extra["frametime"],
                )
            entries.append(
                dict(
                    clip=clip, style=m["style"], validation=m["validation"],
                    len_ratio=m["len_ratio"], name=m["name"], index=m["index"],
                    skeleton=m["skeleton"], anim=anim, audio=audio,
                    _aug=j,  # within-shard order breaks ties between a clip's augmentations
                )
            )
    entries.sort(key=lambda c: (c["index"], c["_aug"]))
    return _assemble(entries, conf, out_path)


def _assemble(all_clips, conf, out_path):
    """Corpus assembly + statistics + final artifacts (shared by the serial
    path and the shard merge)."""
    keys = ("audio_features",) + _FEATURE_ORDER
    accum = {k: [] for k in keys}
    ranges_train, ranges_valid = [], []
    labels_train, labels_valid = [], []
    cursor = 0
    for c in all_clips:
        clip = c["clip"]
        n = len(clip["audio_features"])
        for k in keys:
            accum[k].append(clip[k])
        rng = [cursor, cursor + n]
        if c["validation"]:
            ranges_valid.append(rng)
            labels_valid.append(c["style"])
        else:
            ranges_train.append(rng)
            labels_train.append(c["style"])
        cursor += n
        # optionally persist trimmed artifacts (data_pipeline.py:436-461)
        if conf.save_trimmed_audio and c["audio"] is not None:
            folder = "valid" if c["validation"] else "train"
            tdir = out_path / "trimmed" / folder
            tdir.mkdir(parents=True, exist_ok=True)
            wav.write_wavefile(tdir / (c["name"] + ".wav"), c["audio"], conf.audio_conf.sampling_rate)
        if conf.save_trimmed_animation and c["anim"] is not None:
            folder = "valid" if c["validation"] else "train"
            tdir = out_path / "trimmed" / folder
            tdir.mkdir(parents=True, exist_ok=True)
            bvh.save(tdir / (c["name"] + ".bvh"), c["anim"])

    label_names = sorted(set(labels_train + labels_valid))
    processed = {k: np.concatenate(v, axis=0).astype(np.float32) for k, v in accum.items()}
    ranges_train = np.asarray(ranges_train, np.int32).reshape(-1, 2)
    ranges_valid = np.asarray(ranges_valid, np.int32).reshape(-1, 2)

    stats = compute_stats(processed, ranges_train)
    common = dict(
        ranges_train=ranges_train,
        ranges_valid=ranges_valid,
        ranges_train_labels=np.asarray([label_names.index(l) for l in labels_train], np.int32),
        ranges_valid_labels=np.asarray([label_names.index(l) for l in labels_valid], np.int32),
        **stats,
    )

    processed_data = {
        "X_audio_features": processed["audio_features"],
        **{
            f"Y_{k}": processed[k]
            for k in _FEATURE_ORDER
            if k not in ("lrot", "gaze_dir")
        },
        **common,
    }

    skel = all_clips[0]["skeleton"]
    data_definition = dict(
        dt=skel["dt"],
        label_names=label_names,
        parents=skel["parents"],
        bone_names=skel["names"],
    )

    if conf.save_final_data:
        np.savez(out_path / "processed_data.npz", **processed_data)
        np.savez(out_path / "stats.npz", **common)
        (out_path / "data_definition.json").write_text(json.dumps(data_definition, indent=4))

    # per-style duration summary: printed and exported as data_info.html
    # (data_pipeline.py:703-734 prints a rich table + console.save_html)
    summary = dataset_summary(
        label_names, ranges_train, common["ranges_train_labels"],
        ranges_valid, common["ranges_valid_labels"],
    )
    print(format_summary_ascii(summary))
    (out_path / "data_info.html").write_text(format_summary_html(summary, conf.to_dict()))

    return processed_data, data_definition


# ---------------------------------------------------------------------------
# dataset summary (data_pipeline.py:703-734)
# ---------------------------------------------------------------------------

def dataset_summary(label_names, ranges_train, ranges_train_labels,
                    ranges_valid, ranges_valid_labels):
    """Per-style train/valid frame counts. Counts are halved like the
    reference's table (which counts each clip once despite the x2
    time-stretch augmentation, data_pipeline.py:711-718)."""
    def frames(ranges, labels, i):
        r = np.asarray(ranges).reshape(-1, 2)[np.asarray(labels) == i]
        return float(np.sum(r[:, 1] - r[:, 0])) / 2 if len(r) else 0.0

    per_style = []
    for i, name in enumerate(label_names):
        tr = frames(ranges_train, ranges_train_labels, i)
        va = frames(ranges_valid, ranges_valid_labels, i)
        per_style.append(dict(style=name, train=tr, valid=va, total=tr + va))
    total = sum(s["total"] for s in per_style)
    return dict(per_style=per_style, total_frames=total, total_seconds=total / 60.0)


def _fmt(n):
    return f"{n:.0f} frames - {n / 60:.1f} secs"


def format_summary_ascii(summary):
    from ..utils.logs import ascii_table

    rows = [
        ["Train"] + [_fmt(s["train"]) for s in summary["per_style"]],
        ["Validation"] + [_fmt(s["valid"]) for s in summary["per_style"]],
        ["Total"] + [_fmt(s["total"]) for s in summary["per_style"]],
    ]
    headers = ["Dataset"] + [s["style"] for s in summary["per_style"]]
    table = ascii_table(headers, rows, title="Data Info")
    return (
        f"{table}\nTotal length of dataset is "
        f"{summary['total_frames']:.0f} frames - {summary['total_seconds']:.1f} seconds"
    )


def format_summary_html(summary, conf_dict=None):
    """Self-contained data_info.html (the reference's console.save_html)."""
    head = "".join(f"<th>{s['style']}</th>" for s in summary["per_style"])
    rows = []
    for label, key in (("Train", "train"), ("Validation", "valid"), ("Total", "total")):
        cells = "".join(f"<td>{_fmt(s[key])}</td>" for s in summary["per_style"])
        rows.append(f"<tr><td>{label}</td>{cells}</tr>")
    conf_html = (
        f"<pre>{json.dumps(conf_dict, indent=2)}</pre>" if conf_dict is not None else ""
    )
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'><title>Data Info</title>"
        "<style>table{border-collapse:collapse}td,th{border:1px solid #888;"
        "padding:4px 8px;font-family:monospace;font-size:13px}</style></head><body>"
        f"<h2>Data Info</h2><table><tr><th>Dataset</th>{head}</tr>{''.join(rows)}</table>"
        f"<p>Total length of dataset is {summary['total_frames']:.0f} frames - "
        f"{summary['total_seconds']:.1f} seconds</p>{conf_html}</body></html>"
    )


# ---------------------------------------------------------------------------
# debug artifacts (reference flags: save_normalized_animations,
# visualize_gaze, visualize_spectrogram — data_pipeline.py:130-138,183-209,
# 476-479; plots are written as PNGs instead of shown interactively)
# ---------------------------------------------------------------------------

def save_normalized_animations(anim_data, feats, out_dir, name):
    """Write <name>_norm.bvh (root-relative joints) and <name>_denorm.bvh
    (root baked back) for visual inspection (data_pipeline.py:183-209)."""
    from ..ops import quat as Q

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    order = anim_data["order"]

    norm = dict(anim_data)
    norm["positions"] = np.asarray(feats.lpos)
    norm["rotations"] = np.degrees(np.asarray(Q.to_euler(feats.lrot, order=order)))
    bvh.save(out_dir / f"{name}_norm.bvh", norm)

    lpos_d = np.asarray(feats.lpos).copy()
    lpos_d[:, 0] = np.asarray(Q.mul_vec(feats.root_rot, feats.lpos[:, 0])) + np.asarray(
        feats.root_pos
    )
    lrot_d = np.asarray(feats.lrot).copy()
    lrot_d[:, 0] = np.asarray(Q.mul(feats.root_rot, feats.lrot[:, 0]))
    denorm = dict(anim_data)
    denorm["positions"] = lpos_d
    denorm["rotations"] = np.degrees(np.asarray(Q.to_euler(lrot_d, order=order)))
    bvh.save(out_dir / f"{name}_denorm.bvh", denorm)


def visualize_gaze(feats, out_path):
    """Top-down scatter of gaze target vs root trajectory
    (data_pipeline.py:130-138), saved as PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    root_pos = np.asarray(feats.root_pos)
    gaze_pos = np.asarray(feats.gaze_pos)
    fig, ax = plt.subplots()
    ax.scatter(root_pos[:, 0], root_pos[:, 2], s=0.2, marker=".", label="root")
    ax.scatter(gaze_pos[0, 0], gaze_pos[0, 2], marker="*", s=80, label="gaze target")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def visualize_spectrogram(audio_features, out_path):
    """Feature-matrix heatmap (data_pipeline.py:476-479), saved as PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(np.asarray(audio_features).T, interpolation="nearest", aspect="auto",
              origin="lower")
    ax.set_xlabel("frame")
    ax.set_ylabel("feature")
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
