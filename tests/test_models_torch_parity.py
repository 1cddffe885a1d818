"""Numerical parity of zeggs_tpu model layers against torch.nn equivalents.

These tests build the reference *architectures* from torch.nn building
blocks (no reference code), convert the torch weights through
zeggs_tpu.io.torch_compat, and require fp32 agreement.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from zeggs_tpu.io import torch_compat as tc
from zeggs_tpu.models import decoder as dec
from zeggs_tpu.models import layers as L
from zeggs_tpu.models import pose as P
from zeggs_tpu.models import speech_encoder as se
from zeggs_tpu.models import style_encoder as ste

pytestmark = pytest.mark.oracle

torch.manual_seed(0)
RNG = np.random.default_rng(2)


def test_gru_cell_matches_torch():
    gru = nn.GRU(12, 16, 1, batch_first=True)
    sd = gru.state_dict()
    params = tc.convert_gru_layer(sd, "", 0)
    # strip the leading "." introduced by empty prefix
    params = {k: v for k, v in params.items()}
    x = RNG.normal(size=(4, 1, 12)).astype(np.float32)
    h0 = RNG.normal(size=(1, 4, 16)).astype(np.float32)
    with torch.no_grad():
        out_t, h_t = gru(torch.from_numpy(x), torch.from_numpy(h0))
    ours = np.asarray(L.gru_cell(params, jnp.asarray(x[:, 0]), jnp.asarray(h0[0])))
    np.testing.assert_allclose(ours, h_t[0].numpy(), atol=1e-5)


def test_gru_scan_matches_torch_sequence():
    gru = nn.GRU(8, 10, 1, batch_first=True)
    params = tc.convert_gru_layer(gru.state_dict(), "", 0)
    x = RNG.normal(size=(3, 20, 8)).astype(np.float32)
    with torch.no_grad():
        out_t, _ = gru(torch.from_numpy(x))
    ys, _ = L.gru_scan(params, jnp.asarray(x), jnp.zeros((3, 10)))
    np.testing.assert_allclose(np.asarray(ys), out_t.numpy(), atol=1e-5)


class _TorchSpeechEncoder(nn.Module):
    """Reference architecture (modules.py:249-272) built from torch.nn."""

    def __init__(self, input_size, hidden_size, output_size):
        super().__init__()
        self.layer0 = nn.Conv1d(input_size, hidden_size, 1, padding="same", padding_mode="replicate")
        self.layer1 = nn.Conv1d(hidden_size, output_size, 31, padding="same", padding_mode="replicate")
        self.layer2 = nn.Linear(output_size, output_size)

    def forward(self, x):
        x = torch.swapaxes(x, 1, 2)
        x = torch.nn.functional.elu(self.layer0(x))
        x = torch.nn.functional.elu(self.layer1(x))
        x = torch.swapaxes(x, 1, 2)
        return torch.nn.functional.elu(self.layer2(x))


def test_speech_encoder_matches_torch():
    tmod = _TorchSpeechEncoder(81, 64, 64).eval()
    params = tc.convert_speech_encoder(tmod.state_dict())
    x = RNG.normal(size=(2, 50, 81)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    ours = np.asarray(se.apply(params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


class _TorchStyleEncoderAttn(nn.Module):
    """Reference attn style encoder (modules.py:346-420) from torch.nn."""

    def __init__(self, input_size, hidden_size, out_size):
        super().__init__()
        self.conv0 = nn.Conv1d(input_size, hidden_size, 3, padding=1)
        self.ln0 = nn.LayerNorm(hidden_size)
        self.conv1 = nn.Conv1d(hidden_size, out_size, 3, padding=1)
        self.ln1 = nn.LayerNorm(out_size)
        self.mha = nn.MultiheadAttention(out_size, 4, 0.1)
        self.mha_ln = nn.LayerNorm(out_size)
        self.ff_conv0 = nn.Conv1d(out_size, out_size, 3, padding=1)
        self.ff_conv1 = nn.Conv1d(out_size, out_size, 3, padding=1)
        self.ff_ln = nn.LayerNorm(out_size)
        self.out_size = out_size

    def forward(self, x, pos):
        h = torch.relu(self.conv0(x.transpose(1, 2)).transpose(1, 2))
        h = self.ln0(h)
        h = torch.relu(self.conv1(h.transpose(1, 2)).transpose(1, 2))
        h = self.ln1(h)
        h = h + pos
        a, _ = self.mha(h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1))
        h = self.mha_ln(a.transpose(0, 1) + h)
        f = torch.relu(self.ff_conv0(h.transpose(1, 2)).transpose(1, 2))
        f = self.ff_conv1(f.transpose(1, 2)).transpose(1, 2)
        h = self.ff_ln(f + h)
        return torch.sum(h, dim=1) / h.shape[1]


def _style_sd_mapping(tmod):
    """Re-key the torch test module's state dict to the reference layout
    expected by the converter."""
    sd = tmod.state_dict()
    m = {}
    ren = {
        "conv0": "encoder.convs.0.conv",
        "ln0": "encoder.convs.2",
        "conv1": "encoder.convs.4.conv",
        "ln1": "encoder.convs.6",
        "mha": "encoder.blocks.0.attention.multi_head_attention",
        "mha_ln": "encoder.blocks.0.attention.layer_norm",
        "ff_conv0": "encoder.blocks.0.feed_forward.convs.0.conv",
        "ff_conv1": "encoder.blocks.0.feed_forward.convs.2.conv",
        "ff_ln": "encoder.blocks.0.feed_forward.layer_norm",
    }
    for k, v in sd.items():
        head, rest = k.split(".", 1)
        m[f"{ren[head]}.{rest}"] = v
    return m


def test_style_encoder_attn_matches_torch():
    T, D, H, E = 40, 30, 24, 16
    tmod = _TorchStyleEncoderAttn(D, H, E).eval()
    params = {"body": tc.convert_style_encoder_attn(_style_sd_mapping(tmod))}
    x = RNG.normal(size=(2, T, D)).astype(np.float32)
    pos = np.asarray(ste.sinusoidal_pos_enc(T, E))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x), torch.from_numpy(pos)).numpy()
    ours = np.asarray(ste.apply_attn(params["body"], jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_style_encoder_attn_padding_equivalence():
    """Padded+masked attn encoder == unpadded run (TPU static-shape design)."""
    T, Lt, D, H, E = 48, 33, 20, 16, 8
    key = jax.random.PRNGKey(0)
    params = ste.init(key, D, H, E // 2, encoder_type="attn", use_vae=True)
    x = RNG.normal(size=(1, Lt, D)).astype(np.float32)
    xp = np.zeros((1, T, D), np.float32)
    xp[:, :Lt] = x
    full = np.asarray(ste.apply_attn(params["body"], jnp.asarray(x), train=False))
    padded = np.asarray(
        ste.apply_attn(params["body"], jnp.asarray(xp), lengths=jnp.array([Lt]), train=False)
    )
    np.testing.assert_allclose(padded, full, atol=1e-5)


def test_style_encoder_gru_padding_equivalence():
    T, Lt, D, H, E = 32, 21, 10, 12, 8
    key = jax.random.PRNGKey(1)
    params = ste.init(key, D, H, E, encoder_type="gru", use_vae=False)
    x = RNG.normal(size=(1, Lt, D)).astype(np.float32)
    xp = np.zeros((1, T, D), np.float32)
    xp[:, :Lt] = x
    full = np.asarray(ste.apply_gru(params["body"], jnp.asarray(x), train=False))
    padded = np.asarray(
        ste.apply_gru(params["body"], jnp.asarray(xp), lengths=jnp.array([Lt]), train=False)
    )
    np.testing.assert_allclose(padded, full, atol=1e-5)


def test_vae_head_reparameterization():
    key = jax.random.PRNGKey(3)
    D, H, E = 10, 8, 4
    params = ste.init(key, D, H, E, encoder_type="attn", use_vae=True)
    x = jnp.asarray(RNG.normal(size=(2, 12, D)).astype(np.float32))
    emb, mu, logvar = ste.apply(
        params, x, style_embedding_size=E, temperature=1.0, sample_rng=None
    )
    np.testing.assert_allclose(np.asarray(emb), np.asarray(mu), atol=0)
    # higher temperature shrinks deviation from mu
    e1, _, _ = ste.apply(
        params, x, style_embedding_size=E, temperature=1.0,
        sample_rng=jax.random.PRNGKey(7),
    )
    e2, _, _ = ste.apply(
        params, x, style_embedding_size=E, temperature=100.0,
        sample_rng=jax.random.PRNGKey(7),
    )
    d1 = np.abs(np.asarray(e1) - np.asarray(mu)).mean()
    d2 = np.abs(np.asarray(e2) - np.asarray(mu)).mean()
    assert d2 < d1 / 50


def _tiny_setup(B=2, J=4, T=6, S=5, C=3):
    """Small random decoder + consistent stats for rollout tests."""
    pose_in = 6 + J * 15 + 3
    pose_out = 6 + J * 15
    key = jax.random.PRNGKey(5)
    params = dec.init(key, pose_in, pose_out, S, C, hidden_size=16, num_rnn_layers=2)
    stats = {
        "anim_input_mean": jnp.asarray(RNG.normal(size=(pose_in,)).astype(np.float32)),
        "anim_input_std": jnp.asarray(RNG.uniform(0.5, 2.0, size=(pose_in,)).astype(np.float32)),
        "anim_output_mean": jnp.asarray(RNG.normal(size=(pose_out,)).astype(np.float32) * 0.01),
        "anim_output_std": jnp.asarray(RNG.uniform(0.5, 2.0, size=(pose_out,)).astype(np.float32)),
    }
    q = RNG.normal(size=(B, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    state = dict(
        root_pos=jnp.asarray(RNG.normal(size=(B, 3)).astype(np.float32)),
        root_rot=jnp.asarray(q),
        root_vel=jnp.asarray(RNG.normal(size=(B, 3)).astype(np.float32)),
        root_vrt=jnp.asarray(RNG.normal(size=(B, 3)).astype(np.float32)),
        lpos=jnp.asarray(RNG.normal(size=(B, J, 3)).astype(np.float32)),
        ltxy=jnp.asarray(RNG.normal(size=(B, J, 2, 3)).astype(np.float32)),
        lvel=jnp.asarray(RNG.normal(size=(B, J, 3)).astype(np.float32)),
        lvrt=jnp.asarray(RNG.normal(size=(B, J, 3)).astype(np.float32)),
    )
    cond = dict(
        gaze_pos=jnp.asarray(RNG.normal(size=(B, T, 3)).astype(np.float32)),
        speech_encoding=jnp.asarray(RNG.normal(size=(B, T, S)).astype(np.float32)),
        style_encoding=jnp.asarray(RNG.normal(size=(B, T, C)).astype(np.float32)),
    )
    return params, stats, state, cond, J


def _oracle_rollout(params, stats, state, cond, J, dt=1.0 / 60):
    """Per-frame Python-loop oracle using the same primitives but none of the
    scan/hoisting machinery — validates the fused scan implementation."""
    T = cond["speech_encoding"].shape[1]
    cur = dict(state)
    pose0 = P.vectorize_input(
        cur["root_pos"], cur["root_rot"], cur["root_vel"], cur["root_vrt"],
        cur["lpos"], cur["ltxy"], cur["lvel"], cur["lvrt"],
        cond["gaze_pos"][:, 0], stats["anim_input_mean"], stats["anim_input_std"],
    )
    h = dec.cell_state_encoder(params["cell_state_encoder"], pose0, cond["style_encoding"][:, 0])
    outs = [[np.asarray(cur[k]) for k in ("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt")]]
    cp = params["cell"]
    for i in range(1, T):
        pose = P.vectorize_input(
            cur["root_pos"], cur["root_rot"], cur["root_vel"], cur["root_vrt"],
            cur["lpos"], cur["ltxy"], cur["lvel"], cur["lvrt"],
            cond["gaze_pos"][:, i], stats["anim_input_mean"], stats["anim_input_std"],
        )
        x = jnp.concatenate([pose, cond["speech_encoding"][:, i], cond["style_encoding"][:, i]], axis=-1)
        hidden = jax.nn.elu(L.linear(cp["layer0"], x))
        gin = jnp.concatenate([hidden, x], axis=-1)
        h1 = L.gru_cell(cp["gru0"], gin, h[0])
        h2 = L.gru_cell(cp["gru1"], h1, h[1])
        out = L.linear(cp["out"], h2)
        new = P.devectorize_output(
            out, cur["root_pos"], cur["root_rot"], J, dt,
            stats["anim_output_mean"], stats["anim_output_std"],
        )
        h = jnp.stack([h1, h2])
        cur = dict(zip(("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"), new))
        outs.append([np.asarray(v) for v in new])
    return [np.stack([o[k] for o in outs], axis=1) for k in range(8)]


def test_decoder_rollout_matches_oracle():
    params, stats, state, cond, J = _tiny_setup()
    ours = dec.rollout(
        params, **state, **cond,
        anim_input_mean=stats["anim_input_mean"],
        anim_input_std=stats["anim_input_std"],
        anim_output_mean=stats["anim_output_mean"],
        anim_output_std=stats["anim_output_std"],
        dt=1.0 / 60,
    )
    ref = _oracle_rollout(params, stats, state, cond, J)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-5)


def test_vectorize_devectorize_inverse_shapes():
    """devectorize(vectorize-ish) layout: splitting indices line up."""
    B, J = 3, 75
    pose_out = 6 + J * 15
    pred = jnp.zeros((B, pose_out))
    mean = jnp.zeros((pose_out,))
    std = jnp.ones((pose_out,))
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (B, 1))
    out = P.devectorize_output(pred, jnp.zeros((B, 3)), q, J, 1 / 60, mean, std)
    assert out[4].shape == (B, J, 3)
    assert out[5].shape == (B, J, 2, 3)
    # zero velocities -> unchanged root
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=0)
    # quat_normalize's eps=1e-5 in the small-angle exp branch (faithful to
    # the reference) makes identity come out as 0.99999.
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(q), atol=2e-5)


class _TorchStyleEncoderGRU(nn.Module):
    """Reference GRU style encoder (modules.py:307-343) from torch.nn."""

    def __init__(self, input_size, hidden_size, out_size):
        super().__init__()
        self.conv0 = nn.Conv1d(input_size, hidden_size, 3, padding=1)
        self.conv1 = nn.Conv1d(hidden_size, hidden_size, 3, padding=1)
        self.rnn = nn.GRU(hidden_size, hidden_size, 1, batch_first=True, bidirectional=True)
        self.proj = nn.Linear(hidden_size * 2, out_size)

    def forward(self, x):
        h = torch.relu(self.conv0(x.transpose(1, 2)).transpose(1, 2))
        h = torch.relu(self.conv1(h.transpose(1, 2)).transpose(1, 2))
        out, _ = self.rnn(h)
        return self.proj(out[:, -1])


def test_style_encoder_gru_matches_torch():
    D, H, E, T = 14, 12, 6, 25
    tmod = _TorchStyleEncoderGRU(D, H, E).eval()
    sd = tmod.state_dict()
    mapped = {}
    for k, v in sd.items():
        if k.startswith("conv0"):
            mapped["encoder.convs.0.conv" + k[5:]] = v
        elif k.startswith("conv1"):
            mapped["encoder.convs.2.conv" + k[5:]] = v
        elif k.startswith("rnn"):
            mapped["encoder.rnn_layer" + k[3:]] = v
        else:
            mapped["encoder.projection_layer.linear_layer" + k[4:]] = v
    from zeggs_tpu.io import torch_compat as tc2

    params = tc2.convert_style_encoder(mapped, "gru")
    x = RNG.normal(size=(3, T, D)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    ours = np.asarray(ste.apply_gru(params["body"], jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_film_decoder_rollout_runs_and_uses_style():
    """FiLM cell: full rollout runs; style conditioning changes the output."""
    B, J, T, S, C = 2, 4, 5, 6, 3
    pose_in = 6 + J * 15 + 3
    pose_out = 6 + J * 15
    key = jax.random.PRNGKey(9)
    params = dec.init(key, pose_in, pose_out, S, C, hidden_size=16,
                      num_rnn_layers=2, rnn_cond="film")
    stats = [
        jnp.zeros(pose_in), jnp.ones(pose_in),
        jnp.zeros(pose_out), jnp.ones(pose_out),
    ]
    q = RNG.normal(size=(B, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    state = (
        jnp.asarray(RNG.normal(size=(B, 3)).astype(np.float32)),
        jnp.asarray(q),
        jnp.asarray(RNG.normal(size=(B, 3)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(B, 3)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(B, J, 3)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(B, J, 2, 3)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(B, J, 3)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(B, J, 3)).astype(np.float32)),
    )
    gaze = jnp.asarray(RNG.normal(size=(B, T, 3)).astype(np.float32))
    speech = jnp.asarray(RNG.normal(size=(B, T, S)).astype(np.float32))
    style1 = jnp.asarray(RNG.normal(size=(B, T, C)).astype(np.float32))
    style2 = style1 + 1.0

    def run(style):
        return dec.rollout(params, *state, gaze, speech, style, *stats,
                           1 / 60, rnn_cond="film")

    o1 = run(style1)
    o2 = run(style2)
    for a in o1:
        assert np.isfinite(np.asarray(a)).all()
    assert np.abs(np.asarray(o1[4]) - np.asarray(o2[4])).max() > 1e-4
