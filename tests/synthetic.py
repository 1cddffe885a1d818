"""Synthetic fixtures: a small skeleton, smooth motion, audio, stats, and
randomly-initialized networks in the native checkpoint format.

The real ZEGGS dataset ships via git-LFS and is not present, so end-to-end
tests synthesize structurally-identical data (60 fps BVH with Hips/Spine2/
Head joints; 16 kHz wav)."""

import json
from pathlib import Path

import numpy as np

import jax

from zeggs_tpu import config as C
from zeggs_tpu.io import bvh, checkpoint, wav
from zeggs_tpu.models import decoder, speech_encoder, style_encoder

# A minimal humanoid-ish skeleton containing the joints the featurizer
# needs by name.
BONE_NAMES = ["Hips", "Spine", "Spine1", "Spine2", "Neck", "Head", "RightArm", "LeftArm"]
PARENTS = [-1, 0, 1, 2, 3, 4, 3, 3]
NJOINTS = len(BONE_NAMES)
LABELS = ["Neutral", "Happy", "Sad"]

POSE_IN = 6 + NJOINTS * 15 + 3
POSE_OUT = 6 + NJOINTS * 15


def small_options():
    return C.Options(
        net=C.NetworkConfig(
            decoder=C.DecoderConfig(nhidden=32, num_rnn_layers=2),
            speech_encoder=C.SpeechEncoderConfig(nhidden=16, speech_encoding_size=16),
            style_encoder=C.StyleEncoderConfig(
                nhidden=24, style_encoding_size=8, example_length=64, type="attn", use_vae=True
            ),
        ),
        train=C.TrainConfig(batchsize=4, window=32),
    )


def make_motion(nframes=240, seed=0):
    """Smooth random joint rotations + root translation at 60 fps."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, nframes)[:, None, None]
    phase = rng.uniform(0, 2 * np.pi, (1, NJOINTS, 3))
    amp = rng.uniform(5, 25, (1, NJOINTS, 3))
    rotations = amp * np.sin(2 * t + phase)  # degrees
    offsets = rng.uniform(-10, 10, (NJOINTS, 3)).astype(np.float32)
    offsets[0] = 0
    positions = np.repeat(offsets[None], nframes, axis=0).astype(np.float32)
    positions[:, 0, 0] += np.linspace(0, 30, nframes)
    positions[:, 0, 1] += 90.0
    return {
        "rotations": rotations.astype(np.float32),
        "positions": positions,
        "offsets": offsets,
        "parents": np.asarray(PARENTS, np.int32),
        "names": list(BONE_NAMES),
        "order": "zyx",
        "frametime": 1.0 / 60.0,
    }


def make_audio(seconds=2.0, fs=16000, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    x = 0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    x += 0.05 * rng.normal(size=t.shape)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


def write_corpus(root: Path, n_clips=2, nframes=240):
    """Write a tiny data directory: stats, data definition, pipeline conf,
    networks — everything GesturePipeline needs."""
    root = Path(root)
    data_dir = root / "processed"
    net_dir = root / "models"
    data_dir.mkdir(parents=True, exist_ok=True)
    net_dir.mkdir(parents=True, exist_ok=True)

    opts = small_options()

    # data definition
    (data_dir / "data_definition.json").write_text(
        json.dumps(
            {
                "dt": 1.0 / 60.0,
                "label_names": LABELS,
                "parents": PARENTS,
                "bone_names": BONE_NAMES,
            }
        )
    )
    # audio conf
    conf = C.PipelineConfig(audio_conf=C.MelConfig(normalize_loudness=False)).to_dict()
    (data_dir / "data_pipeline_conf.json").write_text(json.dumps(conf))

    # stats (structurally valid: positive stds)
    rng = np.random.default_rng(3)
    np.savez(
        data_dir / "stats.npz",
        audio_input_mean=rng.normal(size=81).astype(np.float32) * 0.1,
        audio_input_std=np.float32(1.0),
        anim_input_mean=rng.normal(size=POSE_IN).astype(np.float32) * 0.01,
        anim_input_std=np.ones(POSE_IN, np.float32),
        anim_output_mean=rng.normal(size=POSE_OUT).astype(np.float32) * 0.01,
        anim_output_std=np.ones(POSE_OUT, np.float32),
    )

    # networks
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    se_p = speech_encoder.init(k1, 81, opts.net.speech_encoder.nhidden, opts.net.speech_encoder.speech_encoding_size)
    st_p = style_encoder.init(
        k2, POSE_IN, opts.net.style_encoder.nhidden, opts.net.style_encoder.style_encoding_size,
        encoder_type="attn", use_vae=True,
    )
    de_p = decoder.init(
        k3, POSE_IN, POSE_OUT, opts.net.speech_encoder.speech_encoding_size,
        opts.net.style_encoder.style_encoding_size, opts.net.decoder.nhidden, 2,
    )
    checkpoint.save(net_dir / "speech_encoder.npz", se_p)
    checkpoint.save(net_dir / "style_encoder.npz", st_p)
    checkpoint.save(net_dir / "decoder.npz", de_p)

    # clips
    clips = []
    for i in range(n_clips):
        anim = make_motion(nframes, seed=i)
        bvh_path = root / f"clip_{i}.bvh"
        wav_path = root / f"clip_{i}.wav"
        bvh.save(bvh_path, anim)
        wav.write_wavefile(wav_path, make_audio(nframes / 60.0, seed=i), 16000)
        clips.append((bvh_path, wav_path))
    return data_dir, net_dir, clips, opts


def write_raw_corpus(root: Path, n_clips=3, seconds=4.0):
    """Raw-corpus layout for the data pipeline: original/{bvh,wav,timing csv}
    + info.csv with clap-sync timecodes (trims 0.5 s head / 0.5 s tail)."""
    import csv

    root = Path(root)
    orig = root / "original"
    orig.mkdir(parents=True, exist_ok=True)
    fs = 16000
    rows = []
    for i in range(n_clips):
        nframes = int(seconds * 60)
        anim = make_motion(nframes, seed=10 + i)
        audio = make_audio(seconds, fs=fs, seed=10 + i)
        name = f"{i:03d}_Synth_{i}"
        bvh.save(orig / f"{name}.bvh", anim)
        wav.write_wavefile(orig / f"{name}.wav", audio, fs)
        # speaker timing: keep everything (single R row over the full clip)
        with open(orig / f"{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["#", "Start", "End"])
            w.writerow(["R1", "0:0.0", f"0:{seconds:.1f}".replace(".", ".")])
        # acting range [0.5s, seconds-0.5s]; both streams start at 0
        act_start_f = 30  # 0.5 s in 60 fps frames
        act_end_s = int(seconds) - 1
        act_end_f = 30
        rows.append(
            dict(
                audio_filename=f"{name}.wav",
                audio_start_time="00:00:00:00",
                anim_start_time="00:00:00:00",
                acting_start_time=f"00:00:00:{act_start_f}",
                acting_end_time=f"00:00:{act_end_s:02d}:{act_end_f}",
                style=LABELS[i % len(LABELS)],
                anim_bvh=f"{name}.bvh",
                # the last clip is validation; a 1-clip corpus keeps its
                # only clip in training (empty ranges_train is an error in
                # compute_stats)
                validation="TRUE" if (n_clips > 1 and i == n_clips - 1) else "FALSE",
            )
        )
    import csv as _csv

    with open(root / "info.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return root
