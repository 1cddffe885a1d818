"""Autoregressive gesture decoder as a single `lax.scan` over frames.

Reference semantics: ZEGGS/modules.py:11-243 — a CellStateEncoder
initializes a 2-layer GRU's hidden state from (frame-0 pose, style), then a
Python loop feeds back the integrated pose through
vectorize_input -> recurrent cell -> devectorize_output per frame.

TPU-first redesign:
  * The frame loop is one `jax.lax.scan` (time-major), traced/compiled once.
  * The speech/style slices of every per-step matmul are hoisted out of the
    loop: for x_t = [pose_t | speech_t | style_t] and a packed weight W,
    W x_t = W_pose pose_t + (W_speech speech_t + W_style style_t), and the
    parenthesized part is one big (B*T, ·) matmul on the MXU before the scan.
  * Weights can be cast to bfloat16 for the matmuls while the integrated
    pose state (root position/rotation) stays float32.

Two recurrent cells are provided, matching the reference:
  'normal' — Linear+ELU skip into the GRU (modules.py:165-185)
  'film'   — style-conditioned FiLM modulation (modules.py:188-227)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from . import pose as P


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(
    key,
    pose_input_size,
    pose_output_size,
    speech_encoding_size,
    style_encoding_size,
    hidden_size,
    num_rnn_layers=2,
    rnn_cond="normal",
):
    ks = jax.random.split(key, 8)
    all_input = pose_input_size + speech_encoding_size + style_encoding_size
    params = {
        "cell_state_encoder": {
            "l0": L.linear_init(ks[0], pose_input_size + style_encoding_size, hidden_size),
            "l1": L.linear_init(ks[1], hidden_size, hidden_size),
            "l2": L.linear_init(ks[2], hidden_size, hidden_size * num_rnn_layers),
        },
    }
    if rnn_cond == "normal":
        params["cell"] = {
            "layer0": L.linear_init(ks[3], all_input, hidden_size),
            "gru0": L.gru_layer_init(ks[4], all_input + hidden_size, hidden_size),
            "gru1": L.gru_layer_init(ks[5], hidden_size, hidden_size),
            "out": L.linear_init(ks[6], hidden_size, pose_output_size),
        }
    elif rnn_cond == "film":
        kf = jax.random.split(ks[7], 4)
        ps_input = pose_input_size + speech_encoding_size
        params["cell"] = {
            "gammas": L.linear_xavier_init(kf[0], style_encoding_size, hidden_size * 2),
            "betas": L.linear_xavier_init(kf[1], style_encoding_size, hidden_size * 2),
            "layer0": L.linear_init(ks[3], ps_input, hidden_size),
            "gru0": L.gru_layer_init(ks[4], ps_input + hidden_size, hidden_size),
            "gru1": L.gru_layer_init(ks[5], hidden_size, hidden_size),
            "layer2": L.linear_init(kf[2], hidden_size, hidden_size),
            "out": L.linear_init(kf[3], hidden_size, pose_output_size),
        }
    else:
        raise ValueError(f"unknown rnn_cond {rnn_cond!r}")
    return params


def cell_state_encoder(params, pose, style, num_rnn_layers=2):
    """Initial GRU hidden from (frame-0 pose encoding, style)
    (modules.py:230-243). Returns (num_layers, B, H)."""
    h = L.elu(L.linear(params["l0"], jnp.concatenate([pose, style], axis=-1)))
    h = L.elu(L.linear(params["l1"], h))
    out = L.linear(params["l2"], h)
    b = out.shape[0]
    return out.reshape(b, num_rnn_layers, -1).swapaxes(0, 1)


# ---------------------------------------------------------------------------
# rollout
# ---------------------------------------------------------------------------

def _split_w(w, sizes):
    """Split a packed (in, out) weight along its input axis."""
    outs = []
    o = 0
    for s in sizes:
        outs.append(w[o : o + s])
        o += s
    return outs


def init_carry(
    params,
    root_pos,
    root_rot,
    root_vel,
    root_vrt,
    lpos,
    ltxy,
    lvel,
    lvrt,
    gaze0,
    style0,
    anim_input_mean,
    anim_input_std,
    num_rnn_layers=2,
):
    """Build the scan carry from a frame-0 pose state (modules.py:82-98).

    gaze0 (B, 3) and style0 (B, C) are the frame-0 conditioning. The carry
    is (GRU hidden (L, B, H), root_pos, root_rot, root_vel, root_vrt, lpos,
    ltxy, lvel, lvrt) — pass to `rollout_chunk` to advance any number of
    frames (the streaming serving path keeps it across chunks)."""
    pose0 = P.vectorize_input(
        root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt,
        gaze0, anim_input_mean, anim_input_std,
    )
    h0 = cell_state_encoder(params["cell_state_encoder"], pose0, style0, num_rnn_layers)
    return (h0, root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt)


def rollout_chunk(
    params,
    carry,
    gaze_pos,
    speech_encoding,
    style_encoding,
    anim_input_mean,
    anim_input_std,
    anim_output_mean,
    anim_output_std,
    dt,
    num_rnn_layers=2,
    compute_dtype=jnp.float32,
    unroll=1,
    remat=False,
    output_indices=None,
    quantize_int8=False,
):
    """Advance the rollout n = speech_encoding.shape[1] frames from `carry`.

    The chunked core of `rollout` ('normal' cell): conditioning arrays are
    per-step (B, n, ...) — every column is consumed as one scan step (no
    frame-0 special-casing; that lives in `rollout`/`init_carry`). Returns
    (new_carry, trajectories), trajectories (B, n, ...) for the emitted
    frames. Chaining chunks is exactly equivalent to one long rollout, so
    a streaming session can emit frames as audio arrives.
    """
    cp = params["cell"]
    cd = compute_dtype
    B = speech_encoding.shape[0]
    T_steps = speech_encoding.shape[1]
    njoints = carry[5].shape[1]
    pose_dim = int(anim_input_mean.shape[-1])

    # Hoist speech/style contributions of the packed matmuls out of the scan.
    S = speech_encoding.shape[-1]
    C = style_encoding.shape[-1]
    H = cp["gru1"]["w_hh"].shape[0]

    w0_pose, w0_sp, w0_st = _split_w(cp["layer0"]["w"].astype(cd), (pose_dim, S, C))
    # gru0 input = [hidden(H) | pose | speech | style]
    wg_h, wg_pose, wg_sp, wg_st = _split_w(cp["gru0"]["w_ih"].astype(cd), (H, pose_dim, S, C))

    # The [speech|style] conditioning projection can either be hoisted out
    # of the scan as one big (B, T, 3H+H) matmul — best at small batch,
    # where per-step M=1 matmuls are overhead-bound (B=1 latency 63 ms vs
    # 240 ms in-step) — or computed per step, which avoids materializing
    # the (B, T, 3H) tensor (3.7 GB at B=1024; OOM at B=2048) at ~2% extra
    # step FLOPs. Pick by the hoisted tensor's size (static shapes).
    cond = jnp.concatenate([speech_encoding, style_encoding], axis=-1).astype(cd)
    w_sp_st_l0 = jnp.concatenate([w0_sp, w0_st], axis=0)
    w_sp_st_g0 = jnp.concatenate([wg_sp, wg_st], axis=0)
    b_l0 = cp["layer0"]["b"].astype(cd)
    b_g0 = cp["gru0"]["b_ih"].astype(cd)
    hoist = B * (T_steps + 1) * 4 * H * jnp.dtype(cd).itemsize < 512 * 1024 * 1024
    if hoist:
        pre_l0 = cond @ w_sp_st_l0 + b_l0  # (B, T_steps, H)
        pre_g0 = cond @ w_sp_st_g0 + b_g0  # (B, T_steps, 3H)

    gru0_rest = {k: v.astype(cd) for k, v in cp["gru0"].items() if k != "w_ih"}
    gru1 = {k: v.astype(cd) for k, v in cp["gru1"].items()}
    w_out = cp["out"]["w"].astype(cd)
    b_out = cp["out"]["b"].astype(cd)

    # int8 quantized compute (inference only): per-output-column symmetric
    # int8 weights + dynamic per-row activation quant; the in-step matmuls
    # run int8 x int8 -> int32 on the MXU at 2x bf16 peak. Accuracy matches
    # the fused int8 serving kernel (pose MAE ~5e-4 vs fp32 at full scale,
    # inside the 1e-3 parity budget) — see ops/pallas/decoder_kernel.py.
    # Dequantized dot outputs / gates are carried in ``compute_dtype``
    # (bf16 on TPU): halving the (B, 3H) dot-output HBM traffic measured
    # +5% at B=2048 (4.30M -> 4.52M frames/s); the quantization scales and
    # pose integration stay float32.
    if quantize_int8:
        def _qw(w):
            w = w.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-12) / 127.0
            return jnp.round(w / s).astype(jnp.int8), s

        def _qa(x):
            x = x.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
            return jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8), s

        def _qdot(xq_sx, wq_sw):
            (xq, sx), (wq, sw) = xq_sx, wq_sw
            acc = jax.lax.dot_general(
                xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * (sx * sw)).astype(cd)

        q_w0_pose = _qw(cp["layer0"]["w"][:pose_dim])
        q_wg_h = _qw(cp["gru0"]["w_ih"][:H])
        q_wg_pose = _qw(cp["gru0"]["w_ih"][H : H + pose_dim])
        q_g0_whh = _qw(cp["gru0"]["w_hh"])
        q_g1_wih = _qw(cp["gru1"]["w_ih"])
        q_g1_whh = _qw(cp["gru1"]["w_hh"])
        q_w_out = _qw(cp["out"]["w"])
        b_g0_hh = cp["gru0"]["b_hh"].astype(cd)
        b_g1_ih = cp["gru1"]["b_ih"].astype(cd)
        b_g1_hh = cp["gru1"]["b_hh"].astype(cd)

    mean_in = anim_input_mean.astype(jnp.float32)
    std_in = anim_input_std.astype(jnp.float32)
    mean_out = anim_output_mean.astype(jnp.float32)
    std_out = anim_output_std.astype(jnp.float32)

    def step(carry, xs):
        h, rp, rr, rv, rw, jp, jt, jv, jw = carry
        if hoist:
            gaze_t, pre_l0_t, pre_g0_t = xs
        else:
            gaze_t, cond_t = xs
            pre_l0_t = cond_t @ w_sp_st_l0 + b_l0
            pre_g0_t = cond_t @ w_sp_st_g0 + b_g0
        pose = P.vectorize_input(rp, rr, rv, rw, jp, jt, jv, jw, gaze_t, mean_in, std_in)
        if quantize_int8:
            pose_q = _qa(pose)
            hidden = jax.nn.elu(pre_l0_t.astype(cd) + _qdot(pose_q, q_w0_pose))
            hid_q = _qa(hidden)
            gi = pre_g0_t.astype(cd) + _qdot(hid_q, q_wg_h) + _qdot(pose_q, q_wg_pose)
            gh = _qdot(_qa(h[0]), q_g0_whh) + b_g0_hh
            r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
            z = jax.nn.sigmoid(gi[..., H : 2 * H] + gh[..., H : 2 * H])
            n = jnp.tanh(gi[..., 2 * H :] + r * gh[..., 2 * H :])
            h1 = (1.0 - z) * n + z * h[0].astype(cd)
            gi1 = _qdot(_qa(h1), q_g1_wih) + b_g1_ih
            gh1 = _qdot(_qa(h[1]), q_g1_whh) + b_g1_hh
            r1 = jax.nn.sigmoid(gi1[..., :H] + gh1[..., :H])
            z1 = jax.nn.sigmoid(gi1[..., H : 2 * H] + gh1[..., H : 2 * H])
            n1 = jnp.tanh(gi1[..., 2 * H :] + r1 * gh1[..., 2 * H :])
            h2 = (1.0 - z1) * n1 + z1 * h[1].astype(cd)
            out = (_qdot(_qa(h2), q_w_out) + b_out.astype(cd)).astype(jnp.float32)
        else:
            pose_c = pose.astype(cd)
            hidden = jax.nn.elu(pre_l0_t + pose_c @ w0_pose)
            gi = pre_g0_t + hidden @ wg_h + pose_c @ wg_pose
            # GRU layer 0 (input projection precomputed above)
            gh = h[0].astype(cd) @ gru0_rest["w_hh"] + gru0_rest["b_hh"]
            r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
            z = jax.nn.sigmoid(gi[..., H : 2 * H] + gh[..., H : 2 * H])
            n = jnp.tanh(gi[..., 2 * H :] + r * gh[..., 2 * H :])
            h1 = (1.0 - z) * n + z * h[0].astype(cd)
            # GRU layer 1
            h2 = L.gru_cell(gru1, h1, h[1].astype(cd))
            out = (h2 @ w_out + b_out).astype(jnp.float32)
        new = P.devectorize_output(out, rp, rr, njoints, dt, mean_out, std_out)
        nrp, nrr, nrv, nrw, njp, njt, njv, njw = new
        new_h = jnp.stack([h1.astype(jnp.float32), h2.astype(jnp.float32)])
        new_carry = (new_h, nrp, nrr, nrv, nrw, njp, njt, njv, njw)
        # stack only the requested trajectories: the scan materializes
        # (T, B, ...) for every emitted output, so inference (which needs 4
        # of 8) halves rollout HBM by selecting here.
        emit = new if output_indices is None else tuple(new[i] for i in output_indices)
        return new_carry, emit

    if hoist:
        xs = (
            jnp.swapaxes(gaze_pos, 0, 1),
            jnp.swapaxes(pre_l0, 0, 1),
            jnp.swapaxes(pre_g0, 0, 1),
        )
    else:
        xs = (
            jnp.swapaxes(gaze_pos, 0, 1),
            jnp.swapaxes(cond, 0, 1),
        )
    # remat: recompute per-step activations in the backward pass instead of
    # storing T x (gates + projections) — trades ~2x step FLOPs for O(T)
    # memory reduction on long training windows.
    step_fn = jax.checkpoint(step) if remat else step
    final_carry, ys = jax.lax.scan(step_fn, carry, xs, unroll=unroll)
    return final_carry, tuple(jnp.swapaxes(y, 0, 1) for y in ys)


def rollout(
    params,
    root_pos,
    root_rot,
    root_vel,
    root_vrt,
    lpos,
    ltxy,
    lvel,
    lvrt,
    gaze_pos,
    speech_encoding,
    style_encoding,
    anim_input_mean,
    anim_input_std,
    anim_output_mean,
    anim_output_std,
    dt,
    rnn_cond="normal",
    num_rnn_layers=2,
    compute_dtype=jnp.float32,
    unroll=1,
    remat=False,
    output_indices=None,
    quantize_int8=False,
):
    """Autoregressive rollout.

    Args mirror Decoder.forward (modules.py:47-162): frame-0 pose state
    (B, ...) plus per-frame conditioning gaze_pos (B, T, 3),
    speech_encoding (B, T, S), style_encoding (B, T, C).

    Returns the 8 stacked trajectories (B, T, ...) with frame 0 equal to the
    inputs, exactly like the reference (modules.py:72-162).

    quantize_int8 (inference only, 'normal' cell): run the in-step matmuls
    as int8 x int8 -> int32 on the MXU (2x bf16 peak) with per-column
    weight scales + dynamic per-row activation quantization.
    """
    if rnn_cond != "normal":
        assert not quantize_int8, "int8 path supports the 'normal' cell only"
        return _rollout_film(
            params, root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel,
            lvrt, gaze_pos, speech_encoding, style_encoding, anim_input_mean,
            anim_input_std, anim_output_mean, anim_output_std, dt,
            num_rnn_layers, output_indices=output_indices,
        )

    # Initial hidden state from ground-truth frame 0 (modules.py:82-98).
    carry0 = init_carry(
        params, root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel,
        lvrt, gaze_pos[:, 0], style_encoding[:, 0], anim_input_mean,
        anim_input_std, num_rnn_layers,
    )
    _, ys = rollout_chunk(
        params, carry0, gaze_pos[:, 1:], speech_encoding[:, 1:],
        style_encoding[:, 1:], anim_input_mean, anim_input_std,
        anim_output_mean, anim_output_std, dt, num_rnn_layers=num_rnn_layers,
        compute_dtype=compute_dtype, unroll=unroll, remat=remat,
        output_indices=output_indices, quantize_int8=quantize_int8,
    )

    def stack(first, rest):
        return jnp.concatenate([first[:, None], rest], axis=1)

    firsts = (root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt)
    if output_indices is None:
        return tuple(stack(f, y) for f, y in zip(firsts, ys))
    return tuple(stack(firsts[i], y) for i, y in zip(output_indices, ys))


def fused_b1_supported(params, rnn_cond="normal", num_rnn_layers=2):
    """Whether the whole-rollout fused Pallas kernel can serve this model
    (normal 2-layer cell, MXU-aligned hidden size)."""
    H = params["cell"]["gru1"]["w_hh"].shape[0]
    return rnn_cond == "normal" and num_rnn_layers == 2 and H % 128 == 0


def make_fused_b1_fn(
    params,
    anim_input_mean,
    anim_input_std,
    anim_output_mean,
    anim_output_std,
    dt,
    weights_dtype=jnp.bfloat16,
    interpret=None,
):
    """Build the fused B=1 serving rollout (ops/pallas/decoder_kernel.py).

    Packs the cell weights once (host-side) into the streaming layout and
    returns `fn(state0, gaze_pos, speech_enc, style_enc)` with the same
    return convention as `rollout` (8 stacked trajectories). Inference
    only — the kernel has no VJP.
    """
    from ..ops.pallas import decoder_kernel as DK

    pose_in = int(jnp.shape(anim_input_mean)[-1])
    packed = DK.pack_decoder_weights(params["cell"], pose_in, weights_dtype)
    pose_out = packed["dims"][1]
    stats_packed = DK.pack_stats(
        anim_input_mean, anim_input_std, anim_output_mean, anim_output_std,
        pose_in, pose_out,
    )
    cse = params["cell_state_encoder"]
    mean_in = jnp.asarray(anim_input_mean)
    std_in = jnp.asarray(anim_input_std)

    def fn(state0, gaze_pos, speech_enc, style_enc):
        pose0 = P.vectorize_input(*state0, gaze_pos[:, 0], mean_in, std_in)
        h = cell_state_encoder(cse, pose0, style_enc[:, 0])
        return DK.rollout_fused_b1(
            packed, stats_packed, h[:, 0], *state0, gaze_pos, speech_enc,
            style_enc, dt, interpret=interpret,
        )

    return fn


def _rollout_film(
    params, root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt,
    gaze_pos, speech_encoding, style_encoding, anim_input_mean, anim_input_std,
    anim_output_mean, anim_output_std, dt, num_rnn_layers, output_indices=None,
):
    """FiLM-conditioned cell (modules.py:188-227): style enters only through
    per-layer (gamma, beta) modulation; the GRU input is [hidden|pose|speech].

    ``output_indices`` selects which of the 8 trajectories to stack (same
    contract as rollout_chunk) — the serving path requests (0, 1, 4, 5).
    """
    B, T = speech_encoding.shape[:2]
    njoints = lpos.shape[1]
    cp = params["cell"]
    H = cp["gru1"]["w_hh"].shape[0]

    pose0 = P.vectorize_input(
        root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt,
        gaze_pos[:, 0], anim_input_mean, anim_input_std,
    )
    h0 = cell_state_encoder(params["cell_state_encoder"], pose0, style_encoding[:, 0], num_rnn_layers)

    def step(carry, xs):
        h, rp, rr, rv, rw, jp, jt, jv, jw = carry
        gaze_t, speech_t, style_t = xs
        pose = P.vectorize_input(rp, rr, rv, rw, jp, jt, jv, jw, gaze_t, anim_input_mean, anim_input_std)
        gammas = L.linear(cp["gammas"], style_t) + 1.0
        betas = L.linear(cp["betas"], style_t)
        ps = jnp.concatenate([pose, speech_t], axis=-1)
        hidden = jax.nn.elu(L.linear(cp["layer0"], ps))
        hidden = hidden * gammas[:, :H] + betas[:, :H]
        x = jnp.concatenate([hidden, ps], axis=-1)
        h1 = L.gru_cell(cp["gru0"], x, h[0])
        h2 = L.gru_cell(cp["gru1"], h1, h[1])
        hid2 = jax.nn.elu(L.linear(cp["layer2"], h2))
        hid2 = hid2 * gammas[:, H:] + betas[:, H:]
        out = L.linear(cp["out"], hid2)
        new = P.devectorize_output(out, rp, rr, njoints, dt, anim_output_mean, anim_output_std)
        new_carry = (jnp.stack([h1, h2]),) + new[:2] + (new[2], new[3], new[4], new[5], new[6], new[7])
        emit = new if output_indices is None else tuple(new[i] for i in output_indices)
        return new_carry, emit

    xs = (
        jnp.swapaxes(gaze_pos[:, 1:], 0, 1),
        jnp.swapaxes(speech_encoding[:, 1:], 0, 1),
        jnp.swapaxes(style_encoding[:, 1:], 0, 1),
    )
    carry0 = (h0, root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt)
    _, ys = jax.lax.scan(step, carry0, xs)

    def stack(first, rest):
        return jnp.concatenate([first[:, None], jnp.swapaxes(rest, 0, 1)], axis=1)

    firsts = (root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt)
    if output_indices is None:
        return tuple(stack(f, y) for f, y in zip(firsts, ys))
    return tuple(stack(firsts[i], y) for i, y in zip(output_indices, ys))
