"""Real-TPU end-to-end generation with the reference's v1 artifacts."""

import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.random as jr

from zeggs_tpu import config as C
from zeggs_tpu.infer import GesturePipeline, generate_gesture
from zeggs_tpu.io import bvh, checkpoint, wav
from zeggs_tpu.models import decoder, style_encoder
from synthetic import make_audio

REF_DATA = Path("/root/reference/data/processed_v1")
REF_MODELS = Path("/root/reference/data/outputs/v1/saved_models")


def main():
    root = Path("/tmp/zeggs_tpu_e2e")
    root.mkdir(exist_ok=True)
    net_dir = root / "models"
    net_dir.mkdir(exist_ok=True)
    dd = json.loads((REF_DATA / "data_definition.json").read_text())
    nj = len(dd["bone_names"])
    pose_in, pose_out = 6 + nj * 15 + 3, 6 + nj * 15
    shutil.copy(REF_MODELS / "speech_encoder.pt", net_dir / "speech_encoder.pt")
    if not (net_dir / "decoder.npz").exists():
        k1, k2 = jr.split(jr.PRNGKey(0))
        checkpoint.save(net_dir / "decoder.npz", decoder.init(k1, pose_in, pose_out, 64, 64, 1024, 2))
        checkpoint.save(net_dir / "style_encoder.npz", style_encoder.init(k2, pose_in, 512, 64, "attn", True))
    rng = np.random.default_rng(0)
    nframes = 120
    t = np.linspace(0, 2 * np.pi, nframes)[:, None, None]
    rot = (rng.uniform(3, 10, (1, nj, 3)) * np.sin(2 * t + rng.uniform(0, 6, (1, nj, 3)))).astype(np.float32)
    off = rng.uniform(-8, 8, (nj, 3)).astype(np.float32)
    off[0] = [0, 95, 0]
    anim = dict(
        rotations=rot, positions=np.repeat(off[None], nframes, 0), offsets=off,
        parents=np.asarray(dd["parents"], np.int32), names=dd["bone_names"],
        order="zyx", frametime=1 / 60,
    )
    bvh.save(root / "style.bvh", anim)
    wav.write_wavefile(root / "speech.wav", make_audio(10.0), 16000)
    pipe = GesturePipeline(net_dir, REF_DATA, options=C.Options())
    t0 = time.time()
    generate_gesture(
        audio_file=root / "speech.wav", styles=[(root / "style.bvh", None)],
        network_path=net_dir, data_path=REF_DATA, results_path=root / "out",
        temperature=1.0, seed=1234, file_name="tpu_e2e", pipeline=pipe,
    )
    print(f"first generate (incl compile): {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    generate_gesture(
        audio_file=root / "speech.wav", styles=[(root / "style.bvh", None)],
        network_path=net_dir, data_path=REF_DATA, results_path=root / "out2",
        temperature=1.0, seed=42, file_name="tpu_e2e2", pipeline=pipe,
    )
    print(f"second generate (warm): {time.time() - t0:.2f} s", flush=True)
    a = bvh.load(root / "out" / "tpu_e2e.bvh")
    print("output:", a["rotations"].shape, "finite:", bool(np.isfinite(a["rotations"]).all()))
    print("TPUE2E_DONE")


if __name__ == "__main__":
    main()
