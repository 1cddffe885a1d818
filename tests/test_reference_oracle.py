"""True-oracle parity: drive the GENUINE reference code end-to-end.

Unlike tests/test_decoder_torch_parity.py (a hand-rebuilt torch oracle),
these tests import /root/reference/ZEGGS's own modules.py + generate.py,
construct the reference networks with random weights, convert the SAME
weights through io/torch_compat, run the reference's ``generate_gesture``
(audio -> BVH, torch CPU) and zeggs_tpu's on identical inputs at
temperature -> deterministic, and assert pose MAE < 1e-3 on the produced
BVH frames (BASELINE.json target; reference path generate.py:22-411).

Skips cleanly when /root/reference or torch is unavailable.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.refharness import import_reference  # noqa: E402
from tests.synthetic import POSE_IN, POSE_OUT, small_options, write_raw_corpus  # noqa: E402
from zeggs_tpu import config as C  # noqa: E402
from zeggs_tpu.data.pipeline import data_pipeline  # noqa: E402
from zeggs_tpu.infer.generate import GesturePipeline, generate_gesture  # noqa: E402
from zeggs_tpu.io import bvh, checkpoint  # noqa: E402
from zeggs_tpu.io.torch_compat import (  # noqa: E402
    convert_decoder,
    convert_speech_encoder,
    convert_style_encoder,
)

pytestmark = pytest.mark.oracle

# temperature -> infinity makes the VAE head deterministic (std =
# exp(0.5 logvar)/temperature, modules.py:297-300); RNG streams differ
# between torch and jax so stochastic parity is impossible by construction
DETERMINISTIC_TEMPERATURE = 1e8


@pytest.fixture(scope="module")
def ref():
    try:
        return import_reference()
    except ImportError as e:
        pytest.skip(f"reference tree unavailable: {e}")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic raw clips + processed artifacts (stats/data_definition/
    data_pipeline_conf) that BOTH implementations consume."""
    root = tmp_path_factory.mktemp("oracle_corpus")
    write_raw_corpus(root, n_clips=3, seconds=4.0)
    conf = C.PipelineConfig(
        base_path=str(root), processed_data_path="processed",
        info_filename="info.csv",
        audio_conf=C.MelConfig(normalize_loudness=False), len_ratios=(1.0,),
        save_trimmed_audio=False, save_trimmed_animation=False,
        save_final_data=True,
    )
    data_pipeline(conf)
    return root


@pytest.fixture(scope="module")
def torch_nets(ref):
    """The reference's own nn.Modules with random (seeded) weights."""
    m = ref.modules
    torch.manual_seed(7)
    opts = small_options()
    net = opts.net
    nets = {
        "speech_encoder": m.SpeechEncoder(
            81, net.speech_encoder.nhidden, net.speech_encoder.speech_encoding_size
        ),
        "style_encoder": m.StyleEncoder(
            POSE_IN, net.style_encoder.nhidden,
            net.style_encoder.style_encoding_size, type="attn", use_vae=True,
        ),
        "decoder": m.Decoder(
            POSE_IN, POSE_OUT, net.speech_encoder.speech_encoding_size,
            net.style_encoder.style_encoding_size, net.decoder.nhidden, 2,
            rnn_cond="normal",
        ),
    }
    for mod in nets.values():
        mod.eval()
    return nets, opts


def _save_both(nets, ref_dir: Path, jax_dir: Path):
    ref_dir.mkdir(parents=True, exist_ok=True)
    jax_dir.mkdir(parents=True, exist_ok=True)
    for name, mod in nets.items():
        torch.save(mod, ref_dir / f"{name}.pt")
    checkpoint.save(jax_dir / "speech_encoder.npz",
                    convert_speech_encoder(nets["speech_encoder"].state_dict()))
    checkpoint.save(jax_dir / "style_encoder.npz",
                    convert_style_encoder(nets["style_encoder"].state_dict(), "attn"))
    checkpoint.save(jax_dir / "decoder.npz",
                    convert_decoder(nets["decoder"].state_dict()))


def test_generate_gesture_matches_reference_end_to_end(ref, corpus, torch_nets, tmp_path):
    """audio+style BVH -> gesture BVH through BOTH stacks; pose MAE < 1e-3."""
    nets, opts = torch_nets
    data_dir = corpus / "processed"
    ref_models, jax_models = tmp_path / "ref_models", tmp_path / "jax_models"
    _save_both(nets, ref_models, jax_models)

    audio_file = corpus / "original" / "000_Synth_0.wav"
    style_bvh = corpus / "original" / "001_Synth_1.bvh"
    style_range = (10, 80)

    ref_out = tmp_path / "ref_out"
    ref.generate.generate_gesture(
        Path(audio_file), [(Path(style_bvh), style_range)],
        network_path=Path(ref_models), data_path=Path(data_dir),
        results_path=ref_out, temperature=DETERMINISTIC_TEMPERATURE,
        seed=1234, use_gpu=False, file_name="oracle",
    )

    jax_out = tmp_path / "jax_out"
    jax_out.mkdir()
    pipe = GesturePipeline(jax_models, data_dir, options=opts)
    generate_gesture(
        audio_file, [(style_bvh, style_range)],
        network_path=jax_models, data_path=data_dir, results_path=jax_out,
        temperature=DETERMINISTIC_TEMPERATURE, seed=1234, file_name="oracle",
        pipeline=pipe,
    )

    a = bvh.load(ref_out / "oracle.bvh")
    b = bvh.load(jax_out / "oracle.bvh")
    assert a["rotations"].shape == b["rotations"].shape
    assert a["positions"].shape == b["positions"].shape

    pos_mae = float(np.mean(np.abs(a["positions"] - b["positions"])))
    # compare rotations in quaternion space (euler-degree wraparound at
    # +-180 would spike a raw-degree MAE for equivalent rotations)
    from zeggs_tpu.ops import quat as Q

    qa = np.asarray(Q.from_euler(np.radians(a["rotations"]), a["order"]))
    qb = np.asarray(Q.from_euler(np.radians(b["rotations"]), b["order"]))
    qdiff = np.minimum(np.abs(qa - qb), np.abs(qa + qb))  # q == -q
    rot_mae = float(np.mean(qdiff))

    assert np.isfinite(a["positions"]).all() and np.isfinite(b["positions"]).all()
    print(f"\noracle parity: pos MAE {pos_mae:.2e}, quat MAE {rot_mae:.2e} "
          f"over {a['rotations'].shape[0]} frames")
    assert pos_mae < 1e-3, f"position MAE {pos_mae}"
    assert rot_mae < 1e-3, f"rotation (quat) MAE {rot_mae}"


def _compare_bvh(ref_path: Path, jax_path: Path, tag: str):
    from zeggs_tpu.ops import quat as Q

    a = bvh.load(ref_path)
    b = bvh.load(jax_path)
    assert a["rotations"].shape == b["rotations"].shape, tag
    pos_mae = float(np.mean(np.abs(a["positions"] - b["positions"])))
    qa = np.asarray(Q.from_euler(np.radians(a["rotations"]), a["order"]))
    qb = np.asarray(Q.from_euler(np.radians(b["rotations"]), b["order"]))
    rot_mae = float(np.mean(np.minimum(np.abs(qa - qb), np.abs(qa + qb))))
    assert np.isfinite(a["positions"]).all() and np.isfinite(b["positions"]).all(), tag
    print(f"\n{tag}: pos MAE {pos_mae:.2e}, quat MAE {rot_mae:.2e} "
          f"over {a['rotations'].shape[0]} frames")
    assert pos_mae < 1e-3, f"{tag} position MAE {pos_mae}"
    assert rot_mae < 1e-3, f"{tag} rotation (quat) MAE {rot_mae}"


@pytest.mark.parametrize("blend_type,blend_ratio", [
    ("add", (0.3, 0.7)),
    ("stitch", (0.5, 0.5)),
])
def test_blend_modes_match_reference(ref, corpus, torch_nets, tmp_path,
                                     blend_type, blend_ratio):
    """Two-style blending (generate.py:280-308) + explicit first_pose
    (generate.py:313-354) through BOTH stacks."""
    nets, opts = torch_nets
    data_dir = corpus / "processed"
    ref_models, jax_models = tmp_path / "ref_models", tmp_path / "jax_models"
    _save_both(nets, ref_models, jax_models)

    audio_file = corpus / "original" / "000_Synth_0.wav"
    styles = [(corpus / "original" / "001_Synth_1.bvh", (10, 80)),
              (corpus / "original" / "002_Synth_2.bvh", (0, 60))]
    first_pose = corpus / "original" / "000_Synth_0.bvh"

    ref_out, jax_out = tmp_path / "ref_out", tmp_path / "jax_out"
    jax_out.mkdir()
    common = dict(blend_type=blend_type, blend_ratio=list(blend_ratio),
                  first_pose=Path(first_pose),
                  temperature=DETERMINISTIC_TEMPERATURE, seed=21,
                  file_name="blend")
    ref.generate.generate_gesture(
        Path(audio_file), [(Path(p), r) for p, r in styles],
        network_path=Path(ref_models), data_path=Path(data_dir),
        results_path=ref_out, use_gpu=False, **common,
    )
    pipe = GesturePipeline(jax_models, data_dir, options=opts)
    enc = generate_gesture(
        audio_file, styles, network_path=jax_models, data_path=data_dir,
        results_path=jax_out, pipeline=pipe, **common,
    )
    # "add" returns (1, C); "stitch" returns the per-frame (1, T, C) track
    assert np.asarray(enc).ndim == (2 if blend_type == "add" else 3)
    _compare_bvh(ref_out / "blend.bvh", jax_out / "blend.bvh",
                 f"blend[{blend_type}]")


def test_label_mode_matches_reference(ref, corpus, torch_nets, tmp_path):
    """v2 label-based stylization (generate.py:270-276): one-hot style
    vectors, no style encoder, first_pose mandatory."""
    m = ref.modules
    _, opts = torch_nets
    data_dir = corpus / "processed"
    label_names = json.loads((data_dir / "data_definition.json").read_text())["label_names"]
    nlabels = len(label_names)

    torch.manual_seed(13)
    net = opts.net
    label_nets = {
        "speech_encoder": m.SpeechEncoder(
            81, net.speech_encoder.nhidden, net.speech_encoder.speech_encoding_size
        ),
        "decoder": m.Decoder(
            POSE_IN, POSE_OUT, net.speech_encoder.speech_encoding_size,
            nlabels, net.decoder.nhidden, 2, rnn_cond="normal",
        ),
    }
    for mod in label_nets.values():
        mod.eval()
    ref_models, jax_models = tmp_path / "ref_models", tmp_path / "jax_models"
    ref_models.mkdir(), jax_models.mkdir()
    for name, mod in label_nets.items():
        torch.save(mod, ref_models / f"{name}.pt")
    checkpoint.save(jax_models / "speech_encoder.npz",
                    convert_speech_encoder(label_nets["speech_encoder"].state_dict()))
    checkpoint.save(jax_models / "decoder.npz",
                    convert_decoder(label_nets["decoder"].state_dict()))

    audio_file = corpus / "original" / "000_Synth_0.wav"
    first_pose = corpus / "original" / "001_Synth_1.bvh"

    ref_out, jax_out = tmp_path / "ref_out", tmp_path / "jax_out"
    jax_out.mkdir()
    common = dict(style_encoding_type="label", first_pose=Path(first_pose),
                  temperature=1.0, seed=5, file_name="lbl")
    ref.generate.generate_gesture(
        Path(audio_file), [label_names[1]], network_path=Path(ref_models),
        data_path=Path(data_dir), results_path=ref_out, use_gpu=False, **common,
    )
    pipe = GesturePipeline(jax_models, data_dir, options=opts,
                           style_encoding_type="label")
    generate_gesture(
        audio_file, [label_names[1]], network_path=jax_models,
        data_path=data_dir, results_path=jax_out, pipeline=pipe, **common,
    )
    _compare_bvh(ref_out / "lbl.bvh", jax_out / "lbl.bvh", "label-mode")


def test_film_decoder_and_gru_style_encoder_match_reference(ref, corpus, tmp_path):
    """The two ALTERNATE architectures end-to-end through both stacks:
    RecurrentDecoderFiLM (modules.py:188-227) + StyleEncoderGRU
    (modules.py:307-343) — previously only covered by hand-built parity
    tests, never by the genuine reference code."""
    m = ref.modules
    torch.manual_seed(23)
    base = small_options()
    opts = C.Options(
        net=C.NetworkConfig(
            decoder=C.DecoderConfig(nhidden=base.net.decoder.nhidden,
                                    num_rnn_layers=2, rnn_cond="film"),
            speech_encoder=base.net.speech_encoder,
            style_encoder=C.StyleEncoderConfig(
                nhidden=base.net.style_encoder.nhidden,
                style_encoding_size=base.net.style_encoder.style_encoding_size,
                example_length=base.net.style_encoder.example_length,
                type="gru", use_vae=True,
            ),
        ),
        train=base.train,
    )
    net = opts.net
    nets = {
        "speech_encoder": m.SpeechEncoder(
            81, net.speech_encoder.nhidden, net.speech_encoder.speech_encoding_size
        ),
        "style_encoder": m.StyleEncoder(
            POSE_IN, net.style_encoder.nhidden,
            net.style_encoder.style_encoding_size, type="gru", use_vae=True,
        ),
        "decoder": m.Decoder(
            POSE_IN, POSE_OUT, net.speech_encoder.speech_encoding_size,
            net.style_encoder.style_encoding_size, net.decoder.nhidden, 2,
            rnn_cond="film",
        ),
    }
    for mod in nets.values():
        mod.eval()
    data_dir = corpus / "processed"
    ref_models, jax_models = tmp_path / "ref_models", tmp_path / "jax_models"
    ref_models.mkdir(), jax_models.mkdir()
    for name, mod in nets.items():
        torch.save(mod, ref_models / f"{name}.pt")
    checkpoint.save(jax_models / "speech_encoder.npz",
                    convert_speech_encoder(nets["speech_encoder"].state_dict()))
    checkpoint.save(jax_models / "style_encoder.npz",
                    convert_style_encoder(nets["style_encoder"].state_dict(), "gru"))
    checkpoint.save(jax_models / "decoder.npz",
                    convert_decoder(nets["decoder"].state_dict(), rnn_cond="film"))

    audio_file = corpus / "original" / "000_Synth_0.wav"
    style_bvh = corpus / "original" / "002_Synth_2.bvh"

    ref_out, jax_out = tmp_path / "ref_out", tmp_path / "jax_out"
    jax_out.mkdir()
    common = dict(temperature=DETERMINISTIC_TEMPERATURE, seed=3, file_name="film")
    ref.generate.generate_gesture(
        Path(audio_file), [(Path(style_bvh), (5, 100))],
        network_path=Path(ref_models), data_path=Path(data_dir),
        results_path=ref_out, use_gpu=False, **common,
    )
    pipe = GesturePipeline(jax_models, data_dir, options=opts)
    generate_gesture(
        audio_file, [(style_bvh, (5, 100))], network_path=jax_models,
        data_path=data_dir, results_path=jax_out, pipeline=pipe, **common,
    )
    _compare_bvh(ref_out / "film.bvh", jax_out / "film.bvh", "film+gru")


def test_style_encoding_matches_reference(ref, corpus, torch_nets, tmp_path):
    """audio=None mode: both stacks return the same style embedding."""
    nets, opts = torch_nets
    data_dir = corpus / "processed"
    ref_models, jax_models = tmp_path / "ref_m", tmp_path / "jax_m"
    _save_both(nets, ref_models, jax_models)
    style_bvh = corpus / "original" / "002_Synth_2.bvh"

    ref_enc = ref.generate.generate_gesture(
        None, [(Path(style_bvh), (0, 60))], network_path=Path(ref_models),
        data_path=Path(data_dir), results_path=None,
        temperature=DETERMINISTIC_TEMPERATURE, seed=11, use_gpu=False,
    )
    our_enc = generate_gesture(
        None, [(style_bvh, (0, 60))], network_path=jax_models,
        data_path=data_dir, results_path=None,
        temperature=DETERMINISTIC_TEMPERATURE, seed=11,
        pipeline=GesturePipeline(jax_models, data_dir, options=opts),
    )
    np.testing.assert_allclose(
        np.asarray(our_enc)[0], ref_enc.detach().numpy()[0], atol=2e-5
    )


def test_audio_features_match_reference(ref, corpus):
    """preprocess_audio numerics: reference (per-frame Python rfft loop)
    vs zeggs_tpu (batched rFFT), identical (T, 81) features."""
    from zeggs_tpu.data import features as F
    from zeggs_tpu.io import wav

    conf = json.loads((corpus / "processed" / "data_pipeline_conf.json").read_text())
    audio_file = corpus / "original" / "000_Synth_0.wav"
    _, audio = wav.read_wavfile(audio_file, rescale=True, desired_fs=16000)
    n_frames = int(round(60.0 * (len(audio) / 16000)))

    from tests.refharness import _DictConfig

    ref_feat = ref.data_pipeline.preprocess_audio(
        np.asarray(audio), 60, n_frames, _DictConfig(conf["audio_conf"]),
        feature_type=conf["audio_feature_type"],
    )
    our_feat = F.preprocess_audio(
        np.asarray(audio), 60, n_frames, C.MelConfig.from_dict(conf["audio_conf"]),
        feature_type=tuple(conf["audio_feature_type"]),
    )
    assert ref_feat.shape == tuple(our_feat.shape)
    np.testing.assert_allclose(np.asarray(our_feat), ref_feat, atol=2e-4)


def test_anim_features_match_reference(ref, corpus):
    """preprocess_animation: root frame, velocities, gaze, rot6d — all
    feature groups equal on a real BVH clip."""
    from zeggs_tpu.data import features as F
    from zeggs_tpu.utils import host_cpu

    anim = bvh.load(corpus / "original" / "001_Synth_1.bvh")
    # the reference mutates rotations/positions in place (data_pipeline.py
    # :95-148) — deep-copy the arrays so our featurizer sees pristine input
    anim_ref = {**anim, "rotations": anim["rotations"].copy(),
                "positions": anim["positions"].copy()}
    (r_root_pos, r_root_rot, r_root_vel, r_root_vrt, r_lpos, r_lrot, r_ltxy,
     r_lvel, r_lvrt, _, _, _, _, _, r_gaze_pos, r_gaze_dir) = (
        ref.data_pipeline.preprocess_animation(anim_ref)
    )
    with host_cpu():
        ours = F.preprocess_animation(anim)
    for name, ref_v, our_v in (
        ("root_pos", r_root_pos, ours.root_pos),
        ("root_rot", r_root_rot, ours.root_rot),
        ("root_vel", r_root_vel, ours.root_vel),
        ("root_vrt", r_root_vrt, ours.root_vrt),
        ("lpos", r_lpos, ours.lpos),
        ("ltxy", r_ltxy, ours.ltxy),
        ("lvel", r_lvel, ours.lvel),
        ("lvrt", r_lvrt, ours.lvrt),
        ("gaze_pos", r_gaze_pos, ours.gaze_pos),
        ("gaze_dir", r_gaze_dir, ours.gaze_dir),
    ):
        # the reference runs float64 numpy, ours float32 jnp — finite-
        # difference velocities amplify the dtype gap to ~4e-4 on O(30)
        # values, so tolerance is 1e-3 abs + 1e-3 rel
        np.testing.assert_allclose(
            np.asarray(our_v), np.asarray(ref_v), atol=1e-3, rtol=1e-3,
            err_msg=name,
        )


def test_mel_utilities_match_reference(ref):
    """pre_emphasis_on_mel + num_wav_samples vs the reference functions."""
    from zeggs_tpu.ops import mel

    rng = np.random.default_rng(0)
    spec = rng.uniform(0, 1, size=(80, 37))
    ours = mel.pre_emphasis_on_mel(spec, 0.97, 16000, 80, mel_fmin=20.0,
                                   mel_fmax=7600.0, min_amplitude=1e-5)
    theirs = ref.spectrograms.pre_emphasis_on_mel(
        spec, 0.97, 16000, 80, mel_fmin=20.0, mel_fmax=7600.0,
        min_amplitude=1e-5, logger=None,
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-12)

    for T in (1, 7, 100):
        assert mel.num_wav_samples(T, 800, 200) == ref.spectrograms.get_nb_wav_samples(T, 800, 200)
        assert mel.num_wav_samples(T, 800, 200, centered=False) == (
            ref.spectrograms.get_nb_wav_samples(T, 800, 200, centered=False)
        )
