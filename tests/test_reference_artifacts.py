"""End-to-end against the reference's REAL v1 artifacts: stats.npz,
data_definition.json, data_pipeline_conf.json, and the pretrained
speech_encoder.pt — full ZEGGS dimensions (75 joints, 1134/1131)."""

from pathlib import Path

import numpy as np
import pytest

import jax

from zeggs_tpu import config as C
from zeggs_tpu.infer import GesturePipeline, generate_gesture
from zeggs_tpu.io import bvh, checkpoint
from zeggs_tpu.models import decoder, style_encoder
from tests.synthetic import make_audio

REF_DATA = Path("/root/reference/data/processed_v1")
REF_MODELS = Path("/root/reference/data/outputs/v1/saved_models")

pytestmark = pytest.mark.skipif(
    not (REF_DATA / "stats.npz").exists() or not (REF_MODELS / "speech_encoder.pt").exists(),
    reason="reference artifacts unavailable",
)


@pytest.fixture(scope="module")
def v1_setup(tmp_path_factory):
    """Network dir with the REAL speech encoder + random decoder/style
    encoder at full v1 dimensions; synthetic 75-joint style clip."""
    root = tmp_path_factory.mktemp("v1")
    net_dir = root / "models"
    net_dir.mkdir()

    import json

    dd = json.loads((REF_DATA / "data_definition.json").read_text())
    njoints = len(dd["bone_names"])
    pose_in = 6 + njoints * 15 + 3
    pose_out = 6 + njoints * 15

    # real speech encoder (.pt stays in place; pipeline converts on load);
    # random decoder + style encoder at true dimensions
    import shutil

    shutil.copy(REF_MODELS / "speech_encoder.pt", net_dir / "speech_encoder.pt")
    opts = C.Options()  # full-size v1 config
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    checkpoint.save(
        net_dir / "decoder.npz",
        decoder.init(k1, pose_in, pose_out, 64, 64, 1024, 2),
    )
    checkpoint.save(
        net_dir / "style_encoder.npz",
        style_encoder.init(k2, pose_in, 512, 64, "attn", True),
    )

    # synthetic 75-joint style BVH on the real skeleton
    rng = np.random.default_rng(0)
    nframes = 120
    t = np.linspace(0, 2 * np.pi, nframes)[:, None, None]
    rotations = (
        rng.uniform(3, 10, (1, njoints, 3)) * np.sin(2 * t + rng.uniform(0, 6, (1, njoints, 3)))
    ).astype(np.float32)
    offsets = rng.uniform(-8, 8, (njoints, 3)).astype(np.float32)
    offsets[0] = [0, 95, 0]
    positions = np.repeat(offsets[None], nframes, axis=0)
    anim = {
        "rotations": rotations,
        "positions": positions,
        "offsets": offsets,
        "parents": np.asarray(dd["parents"], np.int32),
        "names": dd["bone_names"],
        "order": "zyx",
        "frametime": 1.0 / 60.0,
    }
    style_bvh = root / "style.bvh"
    bvh.save(style_bvh, anim)

    from zeggs_tpu.io import wav

    audio = make_audio(2.0)
    wav_path = root / "speech.wav"
    wav.write_wavefile(wav_path, audio, 16000)
    return net_dir, style_bvh, wav_path, opts, njoints


def test_v1_full_dims_generation(v1_setup, tmp_path):
    net_dir, style_bvh, wav_path, opts, njoints = v1_setup
    pipe = GesturePipeline(net_dir, REF_DATA, options=opts)
    # stats loaded from the real artifact
    assert pipe.stats["anim_input_mean"].shape == (1134,)
    assert pipe.stats["anim_output_std"].shape == (1131,)
    assert pipe.njoints == 75

    generate_gesture(
        audio_file=wav_path,
        styles=[(style_bvh, None)],
        network_path=net_dir,
        data_path=REF_DATA,
        results_path=tmp_path,
        temperature=0.0,
        seed=1234,
        file_name="v1_out",
        pipeline=pipe,
    )
    out = bvh.load(tmp_path / "v1_out.bvh")
    assert out["rotations"].shape == (120, 75, 3)
    assert np.isfinite(out["rotations"]).all()
    assert out["names"][:3] == ["Hips", "Spine", "Spine1"]
