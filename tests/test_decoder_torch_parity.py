"""Full autoregressive decoder parity against a torch implementation.

Builds the reference decoder architecture from torch.nn primitives (Linear,
GRU) plus quaternion integration written here from the standard formulas,
loads the SAME weights into both sides via torch_compat, and requires the
whole 12-frame rollout to agree at fp32 tolerance — the strongest available
stand-in for "pose MAE < 1e-3 vs the PyTorch reference" given the
reference's decoder checkpoint is not distributed (LFS stub).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from zeggs_tpu.io import torch_compat as tc
from zeggs_tpu.models import decoder as dec

pytestmark = pytest.mark.oracle

torch.manual_seed(1)
RNG = np.random.default_rng(7)

B, J, T, S, C, H = 2, 5, 12, 6, 4, 24
POSE_IN = 6 + J * 15 + 3
POSE_OUT = 6 + J * 15
DT = 1.0 / 60.0


# --- torch quaternion helpers (standard formulas) --------------------------

def t_quat_mul(x, y):
    w1, v1 = x[..., :1], x[..., 1:]
    w2, v2 = y[..., :1], y[..., 1:]
    # Hamilton product written via scalar/vector form
    w = w1 * w2 - (v1 * v2).sum(-1, keepdim=True)
    v = w1 * v2 + w2 * v1 + torch.cross(v1, v2, dim=-1)
    return torch.cat([w, v], dim=-1)


def t_quat_rotate(q, v):
    t = 2.0 * torch.cross(q[..., 1:], v, dim=-1)
    return v + q[..., :1] * t + torch.cross(q[..., 1:], t, dim=-1)


def t_quat_exp_half(v, eps=1e-5):
    """exp of half-angle vector with the reference's small-angle branch."""
    half = torch.linalg.norm(v, dim=-1, keepdim=True)
    big = torch.cat([torch.cos(half), v * torch.sinc(half / math.pi)], dim=-1)
    ident = torch.cat([torch.ones_like(half), v], dim=-1)
    ident = ident / (torch.linalg.norm(ident, dim=-1, keepdim=True) + eps)
    return torch.where(half < eps, ident, big)


class TorchCell(nn.Module):
    """RecurrentDecoderNormal + CellStateEncoder from torch.nn."""

    def __init__(self):
        super().__init__()
        all_in = POSE_IN + S + C
        self.layer0 = nn.Linear(all_in, H)
        self.layer1 = nn.GRU(all_in + H, H, 2, batch_first=True)
        self.layer2 = nn.Linear(H, POSE_OUT)
        self.cs0 = nn.Linear(POSE_IN + C, H)
        self.cs1 = nn.Linear(H, H)
        self.cs2 = nn.Linear(H, H * 2)


def _torch_state_dict_mapping(cell):
    sd = cell.state_dict()
    out = {}
    for k, v in sd.items():
        if k.startswith("cs0"):
            out["cell_state_encoder.layer0" + k[3:]] = v
        elif k.startswith("cs1"):
            out["cell_state_encoder.layer1" + k[3:]] = v
        elif k.startswith("cs2"):
            out["cell_state_encoder.layer2" + k[3:]] = v
        else:
            out["recurrent_decoder." + k] = v
    return out


def _random_unit_quat(shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def torch_rollout(cell, state, cond, mean_in, std_in, mean_out, std_out):
    """Reference Decoder.forward semantics in torch (modules.py:47-162)."""

    def vec_in(rp, rr, rv, rw, lp, lt, lv, lw, gaze):
        gd = t_quat_rotate(torch.cat([rr[..., :1], -rr[..., 1:]], -1), gaze - rp)
        flat = torch.cat(
            [rv.reshape(B, -1), rw.reshape(B, -1), lp.reshape(B, -1),
             lt.reshape(B, -1), lv.reshape(B, -1), lw.reshape(B, -1),
             gd.reshape(B, -1)], dim=1)
        return (flat - mean_in) / std_in

    rp, rr, rv, rw, lp, lt, lv, lw = state
    gaze, speech, style = cond
    outs = [[x.clone() for x in state]]
    h0_in = torch.cat([vec_in(rp, rr, rv, rw, lp, lt, lv, lw, gaze[:, 0]), style[:, 0]], -1)
    h = cell.cs2(nn.functional.elu(cell.cs1(nn.functional.elu(cell.cs0(h0_in)))))
    h = h.reshape(B, 2, H).swapaxes(0, 1).contiguous()
    for i in range(1, T):
        pose = vec_in(rp, rr, rv, rw, lp, lt, lv, lw, gaze[:, i])
        x = torch.cat([pose, speech[:, i], style[:, i]], dim=-1)
        hidden = nn.functional.elu(cell.layer0(x))
        gru_in = torch.cat([hidden, x], dim=-1).unsqueeze(1)
        out, h = cell.layer1(gru_in, h)
        pred = cell.layer2(out.squeeze(1))
        p = pred * std_out + mean_out
        prv, prw = p[:, 0:3], p[:, 3:6]
        plp = p[:, 6 : 6 + J * 3].reshape(B, J, 3)
        plt = p[:, 6 + J * 3 : 6 + J * 9].reshape(B, J, 2, 3)
        plv = p[:, 6 + J * 9 : 6 + J * 12].reshape(B, J, 3)
        plw = p[:, 6 + J * 12 :].reshape(B, J, 3)
        new_rp = t_quat_rotate(rr, prv * DT) + rp
        new_rr = t_quat_mul(t_quat_exp_half(t_quat_rotate(rr, prw * DT) / 2.0), rr)
        rp, rr, rv, rw, lp, lt, lv, lw = new_rp, new_rr, prv, prw, plp, plt, plv, plw
        outs.append([rp.clone(), rr.clone(), rv, rw, lp, lt, lv, lw])
    return [torch.stack([o[k] for o in outs], dim=1) for k in range(8)]


def test_full_decoder_rollout_matches_torch():
    cell = TorchCell().eval()
    sd = _torch_state_dict_mapping(cell)
    params = tc.convert_decoder(sd, "normal")

    mean_in = RNG.normal(size=POSE_IN).astype(np.float32) * 0.01
    std_in = RNG.uniform(0.5, 2.0, POSE_IN).astype(np.float32)
    mean_out = RNG.normal(size=POSE_OUT).astype(np.float32) * 0.01
    std_out = RNG.uniform(0.1, 0.5, POSE_OUT).astype(np.float32)

    state_np = dict(
        root_pos=RNG.normal(size=(B, 3)).astype(np.float32),
        root_rot=_random_unit_quat((B,)),
        root_vel=RNG.normal(size=(B, 3)).astype(np.float32) * 0.1,
        root_vrt=RNG.normal(size=(B, 3)).astype(np.float32) * 0.1,
        lpos=RNG.normal(size=(B, J, 3)).astype(np.float32),
        ltxy=RNG.normal(size=(B, J, 2, 3)).astype(np.float32),
        lvel=RNG.normal(size=(B, J, 3)).astype(np.float32) * 0.1,
        lvrt=RNG.normal(size=(B, J, 3)).astype(np.float32) * 0.1,
    )
    gaze = RNG.normal(size=(B, T, 3)).astype(np.float32)
    speech = RNG.normal(size=(B, T, S)).astype(np.float32)
    style = RNG.normal(size=(B, T, C)).astype(np.float32)

    with torch.no_grad():
        ref = torch_rollout(
            cell,
            [torch.from_numpy(state_np[k]) for k in
             ("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt")],
            (torch.from_numpy(gaze), torch.from_numpy(speech), torch.from_numpy(style)),
            torch.from_numpy(mean_in), torch.from_numpy(std_in),
            torch.from_numpy(mean_out), torch.from_numpy(std_out),
        )

    ours = dec.rollout(
        params,
        *(jnp.asarray(state_np[k]) for k in
          ("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt")),
        jnp.asarray(gaze), jnp.asarray(speech), jnp.asarray(style),
        jnp.asarray(mean_in), jnp.asarray(std_in),
        jnp.asarray(mean_out), jnp.asarray(std_out), DT,
    )

    names = ["root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"]
    for name, a, b in zip(names, ours, ref):
        mae = float(np.abs(np.asarray(a) - b.numpy()).mean())
        assert mae < 1e-3, f"{name}: MAE {mae}"
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=5e-3, err_msg=name)


def test_rollout_int8_quantized_tracks_fp32():
    """The int8 quantized scan path (per-column weight scales, dynamic
    per-row activation quant, int8 MXU dots) tracks the fp32 rollout within
    quantization noise over a 24-frame autoregressive run."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from zeggs_tpu.models import decoder

    njoints = 8
    pose_in = 6 + njoints * 15 + 3
    pose_out = 6 + njoints * 15
    H, S, C, T = 128, 16, 8, 24
    params = decoder.init(jax.random.PRNGKey(3), pose_in, pose_out, S, C, H, 2, "normal")

    rng = np.random.default_rng(0)
    mean_in = jnp.asarray(rng.normal(size=pose_in).astype(np.float32) * 0.05)
    std_in = jnp.asarray(rng.uniform(0.5, 2.0, pose_in).astype(np.float32))
    mean_out = jnp.asarray(rng.normal(size=pose_out).astype(np.float32) * 0.05)
    std_out = jnp.asarray(rng.uniform(0.5, 2.0, pose_out).astype(np.float32))
    q = rng.normal(size=(2, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    state0 = (
        jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32)),
        jnp.asarray(q),
        jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(2, njoints, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, njoints, 2, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, njoints, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(2, njoints, 3)).astype(np.float32) * 0.1),
    )
    gaze = jnp.asarray(rng.normal(size=(2, T, 3)).astype(np.float32))
    speech = jnp.asarray(rng.normal(size=(2, T, S)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(2, T, C)).astype(np.float32))

    args = (params, *state0, gaze, speech, style, mean_in, std_in, mean_out, std_out, 1.0 / 60.0)
    ref = decoder.rollout(*args)
    got = decoder.rollout(*args, quantize_int8=True)
    for name, a, b in zip(
        ["root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"],
        ref, got,
    ):
        err = np.abs(np.asarray(b) - np.asarray(a))
        scale = max(1.0, float(np.abs(np.asarray(a)).max()))
        assert err.max() / scale < 3e-2, (name, err.max(), scale)
