"""Configuration schema (dataclasses) + reference-JSON compatibility.

The reference drives everything from two ad-hoc JSON files
(configs/configs_v1.json and configs/data_pipeline_conf_v1.json, loaded at
main.py:25-28 / data_pipeline.py:740-744 with omegaconf attribute access).
Here a typed schema replaces that, while `from_options_json` still accepts
the reference's exact file format so existing options.json files work.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Sequence

from .ops.mel import MelConfig


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    nhidden: int = 1024
    num_rnn_layers: int = 2
    rnn_cond: str = "normal"  # or "film"


@dataclasses.dataclass(frozen=True)
class SpeechEncoderConfig:
    nhidden: int = 64
    speech_encoding_size: int = 64


@dataclasses.dataclass(frozen=True)
class StyleEncoderConfig:
    nhidden: int = 512
    style_encoding_size: int = 64
    example_length: int = 256
    type: str = "attn"  # or "gru"
    use_vae: bool = True


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    decoder: DecoderConfig = DecoderConfig()
    speech_encoder: SpeechEncoderConfig = SpeechEncoderConfig()
    style_encoder: StyleEncoderConfig = StyleEncoderConfig()


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    niterations: int = 160  # x1000 iterations (train.py:192)
    batchsize: int = 32
    window: int = 256
    learning_rate: float = 1e-4
    learning_rate_decay: float = 0.995
    eps: float = 1e-5
    resume: bool = False
    seed: int = 1234
    style_encoding_type: str = "example"  # or "label"
    generate_samples_step: int = 5000
    use_tensorboard: bool = True
    # TPU-native additions
    mesh_data_axis: int = -1  # -1 = all local devices
    compute_dtype: str = "float32"  # matmul dtype inside the decoder scan
    remat: bool = False  # rematerialize decoder scan steps in backward
    # Decoder-scan unroll for the training rollout. Measured on v5e (full v1
    # dims, B=32 x 256): unroll=4 cuts the step 176 -> 132 ms fp32 / 125 ->
    # 84 ms bf16 (the B=32 per-step matmuls are dispatch-bound, so unrolling
    # amortizes scan overhead); unroll=8 compiles for 13+ min through the
    # remote-compile tunnel for no further gain.
    unroll: int = 4


@dataclasses.dataclass(frozen=True)
class PathsConfig:
    base_path: str = "./data"
    path_processed_data: str = "processed_v1"
    output_dir: Optional[str] = None
    models_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Mirror of configs/data_pipeline_conf_v1.json."""

    base_path: str = "./data"
    processed_data_path: str = "processed_v1"
    save_trimmed_audio: bool = True
    save_trimmed_animation: bool = True
    save_normalized_animations: bool = False
    save_final_data: bool = True
    info_filename: str = "info.csv"
    audio_conf: MelConfig = MelConfig()
    audio_feature_type: Sequence[str] = ("mel_spec", "energy")
    visualize_spectrogram: bool = False
    visualize_gaze: bool = False
    len_ratios: Sequence[float] = (0.9, 1.0)

    @classmethod
    def from_dict(cls, d):
        d = dict(d)
        if "audio_conf" in d:
            d["audio_conf"] = MelConfig.from_dict(d["audio_conf"])
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    @classmethod
    def from_json(cls, path):
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self):
        d = dataclasses.asdict(self)
        d["audio_feature_type"] = list(self.audio_feature_type)
        d["len_ratios"] = list(self.len_ratios)
        return d


@dataclasses.dataclass(frozen=True)
class Options:
    """Top-level bundle == the reference's options.json."""

    name: str = "S2G"
    paths: PathsConfig = PathsConfig()
    net: NetworkConfig = NetworkConfig()
    train: TrainConfig = TrainConfig()

    @classmethod
    def from_options_json(cls, path):
        """Load the reference's options.json / configs_v*.json format
        (keys: name, paths, net_opt, train_opt)."""
        with open(path) as f:
            o = json.load(f)
        return cls.from_options_dict(o)

    @classmethod
    def from_options_dict(cls, o):
        def pick(dc, d):
            fields = {f.name for f in dataclasses.fields(dc)}
            return dc(**{k: v for k, v in d.items() if k in fields})

        net_opt = o.get("net_opt", {})
        net = NetworkConfig(
            decoder=pick(DecoderConfig, net_opt.get("decoder", {})),
            speech_encoder=pick(SpeechEncoderConfig, net_opt.get("speech_encoder", {})),
            style_encoder=pick(StyleEncoderConfig, net_opt.get("style_encoder", {})),
        )
        return cls(
            name=o.get("name", "S2G"),
            paths=pick(PathsConfig, o.get("paths", {})),
            net=net,
            train=pick(TrainConfig, o.get("train_opt", {})),
        )

    def to_options_dict(self):
        """Dump in the reference options.json layout for interop."""
        return {
            "name": self.name,
            "paths": dataclasses.asdict(self.paths),
            "net_opt": {
                "decoder": dataclasses.asdict(self.net.decoder),
                "speech_encoder": dataclasses.asdict(self.net.speech_encoder),
                "style_encoder": dataclasses.asdict(self.net.style_encoder),
            },
            "train_opt": dataclasses.asdict(self.train),
        }


def resolve_output_dirs(opts: Options, name: Optional[str] = None):
    """Reproduce main.py:35-60 directory resolution: output/, saved_models/,
    logs/ under base_path/outputs/<timestamp or name>."""
    import datetime

    paths = opts.paths
    base = Path(paths.base_path)
    if paths.output_dir is None:
        stamp = name or datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        output_dir = base / "outputs" / stamp
    else:
        output_dir = Path(paths.output_dir)
    output_dir.mkdir(exist_ok=True, parents=True)
    models_dir = Path(paths.models_dir) if paths.models_dir else output_dir / "saved_models"
    models_dir.mkdir(exist_ok=True, parents=True)
    logs_dir = output_dir / "logs"
    logs_dir.mkdir(exist_ok=True, parents=True)
    return output_dir, models_dir, logs_dir
