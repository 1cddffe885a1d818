"""Convert reference PyTorch checkpoints into zeggs_tpu parameter pytrees.

The reference saves *whole pickled modules* (train.py:482-485), which couples
checkpoints to the `modules.py` import path. `load_reference_module` unpickles
them against lightweight shim classes (no reference code needed — unpickling
restores attribute dicts directly), extracts the state_dict, and the
`convert_*` functions re-lay the tensors for the MXU-friendly (in, out)
orientation used here.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _t(x):
    """torch tensor -> numpy float32."""
    return np.asarray(x.detach().cpu().numpy(), dtype=np.float32)


def convert_linear(sd, prefix):
    return {"w": _t(sd[f"{prefix}.weight"]).T, "b": _t(sd[f"{prefix}.bias"])}


def convert_conv1d(sd, prefix):
    # torch conv1d weight: (out, in, K) -> ours (K, in, out)
    w = _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)
    return {"w": w, "b": _t(sd[f"{prefix}.bias"])}


def convert_layer_norm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_gru_layer(sd, prefix, layer=0, suffix=""):
    p = f"{prefix}." if prefix else ""
    return {
        "w_ih": _t(sd[f"{p}weight_ih_l{layer}{suffix}"]).T,
        "w_hh": _t(sd[f"{p}weight_hh_l{layer}{suffix}"]).T,
        "b_ih": _t(sd[f"{p}bias_ih_l{layer}{suffix}"]),
        "b_hh": _t(sd[f"{p}bias_hh_l{layer}{suffix}"]),
    }


def convert_speech_encoder(sd):
    """modules.SpeechEncoder state dict -> speech_encoder params."""
    return {
        "conv0": convert_conv1d(sd, "layer0"),
        "conv1": convert_conv1d(sd, "layer1"),
        "linear": convert_linear(sd, "layer2"),
    }


def convert_style_encoder_attn(sd, prefix="encoder"):
    """modules.StyleEncoderAttn -> style_encoder attn body params."""
    mha = f"{prefix}.blocks.0.attention.multi_head_attention"
    return {
        "conv0": convert_conv1d(sd, f"{prefix}.convs.0.conv"),
        "ln0": convert_layer_norm(sd, f"{prefix}.convs.2"),
        "conv1": convert_conv1d(sd, f"{prefix}.convs.4.conv"),
        "ln1": convert_layer_norm(sd, f"{prefix}.convs.6"),
        "mha": {
            "in_proj_w": _t(sd[f"{mha}.in_proj_weight"]).T,
            "in_proj_b": _t(sd[f"{mha}.in_proj_bias"]),
            "out_proj": {
                "w": _t(sd[f"{mha}.out_proj.weight"]).T,
                "b": _t(sd[f"{mha}.out_proj.bias"]),
            },
        },
        "mha_ln": convert_layer_norm(sd, f"{prefix}.blocks.0.attention.layer_norm"),
        "ff_conv0": convert_conv1d(sd, f"{prefix}.blocks.0.feed_forward.convs.0.conv"),
        "ff_conv1": convert_conv1d(sd, f"{prefix}.blocks.0.feed_forward.convs.2.conv"),
        "ff_ln": convert_layer_norm(sd, f"{prefix}.blocks.0.feed_forward.layer_norm"),
    }


def convert_style_encoder_gru(sd, prefix="encoder"):
    return {
        "conv0": convert_conv1d(sd, f"{prefix}.convs.0.conv"),
        "conv1": convert_conv1d(sd, f"{prefix}.convs.2.conv"),
        "gru_fwd": convert_gru_layer(sd, f"{prefix}.rnn_layer", 0),
        "gru_bwd": convert_gru_layer(sd, f"{prefix}.rnn_layer", 0, suffix="_reverse"),
        "proj": convert_linear(sd, f"{prefix}.projection_layer.linear_layer"),
    }


def convert_style_encoder(sd, encoder_type="attn"):
    body = (
        convert_style_encoder_attn(sd)
        if encoder_type == "attn"
        else convert_style_encoder_gru(sd)
    )
    return {"body": body}


def convert_decoder(sd, rnn_cond="normal"):
    """modules.Decoder -> decoder params (normal cell)."""
    params = {
        "cell_state_encoder": {
            "l0": convert_linear(sd, "cell_state_encoder.layer0"),
            "l1": convert_linear(sd, "cell_state_encoder.layer1"),
            "l2": convert_linear(sd, "cell_state_encoder.layer2"),
        }
    }
    rd = "recurrent_decoder"
    if rnn_cond == "normal":
        params["cell"] = {
            "layer0": convert_linear(sd, f"{rd}.layer0"),
            "gru0": convert_gru_layer(sd, f"{rd}.layer1", 0),
            "gru1": convert_gru_layer(sd, f"{rd}.layer1", 1),
            "out": convert_linear(sd, f"{rd}.layer2"),
        }
    else:
        params["cell"] = {
            "gammas": convert_linear(sd, f"{rd}.gammas_predictor.linear_layer"),
            "betas": convert_linear(sd, f"{rd}.betas_predictor.linear_layer"),
            "layer0": convert_linear(sd, f"{rd}.layer0"),
            "gru0": convert_gru_layer(sd, f"{rd}.layer1", 0),
            "gru1": convert_gru_layer(sd, f"{rd}.layer1", 1),
            "layer2": convert_linear(sd, f"{rd}.layer2"),
            "out": convert_linear(sd, f"{rd}.layer3"),
        }
    return params


# ---------------------------------------------------------------------------
# Unpickling reference whole-module checkpoints
# ---------------------------------------------------------------------------

_SHIM_CLASSES = [
    "Decoder",
    "RecurrentDecoderNormal",
    "RecurrentDecoderFiLM",
    "CellStateEncoder",
    "SpeechEncoder",
    "StyleEncoder",
    "StyleEncoderGRU",
    "StyleEncoderAttn",
    "LinearNorm",
    "PositionalEncoding",
    "FFTBlock",
    "MultiHeadAttention",
    "PositionWiseConvFF",
    "ConvNorm1D",
    "AvgPoolNorm1D",
]


def _install_modules_shim():
    """Register a fake `modules` module so torch.load can unpickle the
    reference's pickled nn.Module objects (their attributes restore via
    __dict__; no reference code executes)."""
    import torch.nn as nn

    if "modules" in sys.modules:
        # already importable — either our shim or the genuine reference
        # modules.py (e.g. the oracle parity harness); both can unpickle
        return sys.modules["modules"]
    shim = types.ModuleType("modules")
    shim.__zeggs_shim__ = True
    for name in _SHIM_CLASSES:
        cls = type(name, (nn.Module,), {})
        setattr(shim, name, cls)
    sys.modules["modules"] = shim
    return shim


def load_reference_module(path):
    """torch.load a reference .pt whole-module checkpoint -> state_dict."""
    import torch

    _install_modules_shim()
    module = torch.load(path, map_location="cpu", weights_only=False)
    return module.state_dict()


def load_reference_networks(models_dir, style_encoding_type="example", rnn_cond="normal"):
    """Load speech_encoder/decoder/style_encoder .pt files from a reference
    models dir (generate.py:75-78) into zeggs_tpu pytrees."""
    from pathlib import Path

    models_dir = Path(models_dir)
    out = {}
    se_pt = models_dir / "speech_encoder.pt"
    if se_pt.exists():
        out["speech_encoder"] = convert_speech_encoder(load_reference_module(se_pt))
    dec = models_dir / "decoder.pt"
    if dec.exists():
        out["decoder"] = convert_decoder(load_reference_module(dec), rnn_cond)
    se = models_dir / "style_encoder.pt"
    if style_encoding_type == "example" and se.exists():
        sd = load_reference_module(se)
        etype = "attn" if any("blocks" in k for k in sd) else "gru"
        out["style_encoder"] = convert_style_encoder(sd, etype)
    return out
