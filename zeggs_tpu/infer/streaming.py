"""Streaming gesture synthesis: push audio chunks, pull gesture frames.

Net-new TPU-native capability (the reference, ZEGGS/generate.py:22-411, is
strictly offline): the decoder is a recurrent `lax.scan`, so its carry —
GRU hidden states + integrated root transform + previous pose — can be
checkpointed between jit calls. SURVEY §5's "chunked scan with carried GRU
state" is the natural TPU idiom for long or live audio, instead of any
form of sequence parallelism.

Exactness: a `StreamingSession` fed ARBITRARY chunk splits emits exactly
the same frames as the offline `generate_gesture` on the concatenated
audio (same STFT reflect padding at the stream head/tail, same
mel->60 fps resample clipping, same k=31 conv replicate lookahead, same
scan arithmetic), up to float reassociation across different jit shapes —
verified by tests/test_streaming.py against the offline path.

Pipeline stages, each with its own lookahead (all host-orchestrated,
compute in shape-bucketed jit calls so the program cache stays bounded):

  raw 16 kHz samples
    -> pre-emphasis (1-sample history; off by default, as the reference)
    -> STFT frames (needs n_fft/2 = 400 future samples; head/tail padding
       applied once at stream start / finish())
    -> log-mel + energy rows at 80 Hz
    -> linear resample onto the 60 fps animation grid (1 future mel row)
    -> normalized audio features
    -> speech encoder (k=31 replicate conv: 15 future anim frames)
    -> decoder scan chunks via models.decoder.rollout_chunk (carry kept
       on device between calls)
    -> gesture frames (root_pos, root_rot, lpos, ltxy)

Algorithmic latency to the first gesture frame: ~25 ms of STFT padding +
12.5 ms resample + 250 ms conv lookahead ~= 0.3 s of audio; thereafter
emission tracks the push cadence with that constant lag.

Loudness normalization (BS.1770, data_pipeline.py:34-39) is a GLOBAL
transform and cannot be streamed exactly; sessions take a fixed `gain`
instead (e.g. measured offline from the speaker's calibration clip).
"""

from __future__ import annotations

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import features as F
from ..io import bvh as bvh_io
from ..models import decoder, layers as L
from ..ops import mel
from ..utils import host_cpu

_MEL_BUCKETS = (512, 128, 32, 8, 2, 1)
_SPEECH_BUCKETS = (256, 64, 16, 4, 1)
_DECODER_BUCKETS = (256, 64, 16, 4, 1)


def _largest_bucket(buckets, avail):
    for b in buckets:
        if b <= avail:
            return b
    return 0


class _MelStream:
    """Incremental mel rows, bit-matching ops.mel.mel_spectrogram_tts +
    the 10**(db/20) remap of ops.mel.audio_features.

    Maintains the reflect-padded, pre-emphasized sample stream; emits
    (log_mel (n, n_mels), energy (n,)) rows as enough samples arrive.
    """

    def __init__(self, cfg: mel.MelConfig, gain=1.0, fn_cache=None, grain=1):
        assert cfg.centered, "streaming mel requires the reference's centered STFT"
        # total_frames() reproduces the offline drop-a-frame condition
        # ((max(N, nfft) + nfft) % hop == 0) via max(N, nfft) % hop == 0 —
        # equivalent only when nfft is a hop multiple; reject configs where
        # the two conventions would diverge instead of miscounting frames.
        assert cfg.filter_length % cfg.hop_length == 0, (
            "streaming mel requires filter_length % hop_length == 0 "
            f"(got {cfg.filter_length} % {cfg.hop_length})"
        )
        self.cfg = cfg
        self.gain = float(gain)
        self.nfft = cfg.filter_length
        self.hop = cfg.hop_length
        # grain > 1 = batched-dispatch mode: mid-stream, only consume when a
        # >= grain bucket is ready (remainder stays pending for the next
        # push), and finish() pads the sub-grain tail through the
        # grain-sized program instead of descending to the 2/1-row buckets.
        # Halves per-push dispatches AND keeps the small-bucket programs
        # from ever compiling (each program costs minutes cold / ~10 s warm
        # through a remote-compile tunnel).
        self.grain = int(grain)
        # jitted programs and DFT constants are shared ACROSS sessions via
        # the pipeline-owned cache: a fresh @jax.jit closure per session
        # would re-load every bucket executable through the device tunnel
        # (~seconds each), turning warm sessions cold
        self._fns = fn_cache if fn_cache is not None else {}
        if "mel_consts" not in self._fns:
            self._fns["mel_consts"] = (
                jnp.asarray(mel.hann_symmetric(self.nfft)),
                jnp.asarray(
                    mel.mel_filterbank(
                        cfg.filter_length, cfg.sampling_rate, cfg.n_mel_channels,
                        cfg.mel_fmin, cfg.mel_fmax, cfg.normalize_mel_bins,
                    )
                ),
            )
        self._window, self._basis = self._fns["mel_consts"]
        self._head = np.zeros(0, np.float32)  # emphasized samples pre-start
        self._ext = None  # reflect-headed emphasized stream, next frame at [0]
        self._tail = np.zeros(0, np.float32)  # last <=nfft+1 emphasized samples
        self._prev_raw = None  # last raw sample (pre-emphasis continuation)
        self.n_samples = 0  # raw samples pushed
        self.done = 0  # mel frames emitted
        self.finished = False

    # -- jitted row computation -------------------------------------------

    def _row_fn(self, nf):
        if ("mel", nf) not in self._fns:
            cfg, nfft, hop = self.cfg, self.nfft, self.hop
            window, basis = self._window, self._basis
            n_fft_div = nfft if cfg.real_amplitude else 1
            min_amplitude = cfg.min_clipping / n_fft_div
            dynamic_range = -20.0 * math.log10(min_amplitude)

            @jax.jit
            def fn(x):
                idx = jnp.arange(nf)[:, None] * hop + jnp.arange(nfft)[None, :]
                amp = jnp.abs(jnp.fft.rfft(x[idx] * window[None, :], axis=-1))
                if cfg.real_amplitude:
                    amp = amp / nfft
                m = jnp.abs(amp @ basis.T)
                m = jnp.clip(m, min=min_amplitude)
                db = 20.0 * jnp.log10(m)
                if cfg.normalize_range:
                    db = (db + dynamic_range) / dynamic_range
                lin = 10.0 ** (db / 20.0)
                return jnp.log(lin), jnp.linalg.norm(lin, axis=-1)

            self._fns[("mel", nf)] = fn
        return self._fns[("mel", nf)]

    # -- stream plumbing ----------------------------------------------------

    def _emphasize(self, raw):
        if not self.cfg.pre_emphasis:
            return raw
        prev = self._prev_raw
        self._prev_raw = raw[-1]
        if prev is None:  # y[0] = x[0] (signal_manipulation.py:4-12)
            return np.concatenate([raw[:1], raw[1:] - self.cfg.pre_emph_coeff * raw[:-1]])
        shifted = np.concatenate([[prev], raw[:-1]])
        return raw - self.cfg.pre_emph_coeff * shifted

    def _append(self, emph):
        self._tail = np.concatenate([self._tail, emph])[-(self.nfft + 1):]
        half = self.nfft // 2
        if self._ext is None:
            self._head = np.concatenate([self._head, emph])
            if len(self._head) >= half + 1:
                # np.pad(x, (half, .), 'reflect') head = x[half:0:-1]
                self._ext = np.concatenate([self._head[half:0:-1], self._head])
                self._head = np.zeros(0, np.float32)
        else:
            self._ext = np.concatenate([self._ext, emph])

    def _consume(self, cap=None):
        """Emit frames from the ready window; cap bounds total frames.
        cap is only passed by finish() — it doubles as the flush flag."""
        outs = []
        flush = cap is not None
        while self._ext is not None:
            avail = (len(self._ext) - self.nfft) // self.hop + 1 if len(self._ext) >= self.nfft else 0
            if cap is not None:
                avail = min(avail, cap - self.done)
            if flush and 0 < avail < self.grain:
                # pad-and-slice the tail through the grain-sized program:
                # each mel row is an independent window of samples, so the
                # zero-padded samples only feed the discarded rows
                w = (self.grain - 1) * self.hop + self.nfft
                x = self._ext[:w]
                if len(x) < w:
                    x = np.concatenate([x, np.zeros(w - len(x), np.float32)])
                log_mel, energy = self._row_fn(self.grain)(jnp.asarray(x))
                outs.append((np.asarray(log_mel)[:avail], np.asarray(energy)[:avail]))
                self._ext = self._ext[avail * self.hop:]
                self.done += avail
                continue
            nf = _largest_bucket(_MEL_BUCKETS, avail)
            if nf == 0 or (not flush and nf < self.grain):
                break
            w = (nf - 1) * self.hop + self.nfft
            log_mel, energy = self._row_fn(nf)(jnp.asarray(self._ext[:w]))
            outs.append((np.asarray(log_mel), np.asarray(energy)))
            self._ext = self._ext[nf * self.hop:]
            self.done += nf
        if not outs:
            return np.zeros((0, self.cfg.n_mel_channels), np.float32), np.zeros(0, np.float32)
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))

    # -- public --------------------------------------------------------------

    def push(self, raw):
        raw = np.asarray(raw, np.float32)
        if self.gain != 1.0:
            raw = raw * np.float32(self.gain)
        self.n_samples += len(raw)
        if len(raw):
            self._append(self._emphasize(raw))
        return self._consume()

    def total_frames(self):
        """The offline frame-count convention (ops.mel.stft_magnitude):
        padded length n = max(N, n_fft) + n_fft; frames = (n - n_fft)/hop
        when that divides exactly (the +1 frame is DROPPED), else
        1 + floor((n - n_fft)/hop)."""
        n_pad = max(self.n_samples, self.nfft)
        return n_pad // self.hop if n_pad % self.hop == 0 else n_pad // self.hop + 1

    def finish(self):
        assert not self.finished
        self.finished = True
        half = self.nfft // 2
        # materialize the zero-padded tail (stft_magnitude pads x to n_fft)
        pad0 = max(0, self.nfft - self.n_samples)
        if pad0:
            self._append(np.zeros(pad0, np.float32))
        # reflect tail: np.pad right pad = x[-2 : -half-2 : -1]
        tail = self._tail  # last >= half+1 samples of the (padded) signal
        self._append(tail[-2 : -half - 2 : -1])
        return self._consume(cap=self.total_frames())


class _Resampler:
    """mel-rate rows -> 60 fps feature rows (ops.mel.audio_features
    resample semantics: mel_spec clipped interp, energy extrapolated)."""

    def __init__(self, cfg: mel.MelConfig, anim_fs, feature_type, stats_mean, stats_std):
        self.step = np.float32((cfg.sampling_rate / cfg.hop_length) / anim_fs)
        self.feature_type = feature_type
        self.mean = np.asarray(stats_mean, np.float32)
        self.std = np.asarray(stats_std, np.float32)
        self.log_mel = np.zeros((0, cfg.n_mel_channels), np.float32)
        self.energy = np.zeros(0, np.float32)
        self.done = 0  # anim feature rows emitted

    def _rows(self, i_lo, i_hi, t_mel_final=None):
        t = self.step * np.arange(i_lo, i_hi).astype(np.float32)
        T = len(self.log_mel) if t_mel_final is None else t_mel_final
        feats = []
        if "mel_spec" in self.feature_type:
            tm = np.clip(t, 0.0, np.float32(T - 1.0))
            i0 = np.clip(np.floor(tm).astype(np.int32), 0, T - 2)
            frac = (tm - i0)[:, None]
            feats.append(self.log_mel[i0] * (np.float32(1.0) - frac) + self.log_mel[i0 + 1] * frac)
        if "energy" in self.feature_type:
            i0 = np.clip(np.floor(t).astype(np.int32), 0, T - 2)
            frac = (t - i0)[:, None]
            e = self.energy[:, None]
            feats.append(e[i0] * (np.float32(1.0) - frac) + e[i0 + 1] * frac)
        raw = np.concatenate(feats, axis=-1)
        return (raw - self.mean) / self.std

    def push(self, log_mel, energy):
        """Returns newly-safe normalized feature rows (n, n_features).

        Interior rows need mel rows floor(t) and floor(t)+1 with no end
        clipping: safe while floor(step*i) <= m-2 (then the offline clip
        at T_final-2 >= m-2 is a no-op for these rows). The bound is
        evaluated in float32 — the same arithmetic `_rows` uses — so a
        float32 product landing on an integer boundary can't emit a row
        whose i0+1 index doesn't exist yet."""
        if len(log_mel):
            self.log_mel = np.concatenate([self.log_mel, log_mel])
            self.energy = np.concatenate([self.energy, energy])
        m = len(self.log_mel)
        if m < 2:
            return np.zeros((0, self.mean.shape[-1]), np.float32)
        upper = int(m / float(self.step)) + 2
        t = self.step * np.arange(self.done, upper).astype(np.float32)
        ok = np.floor(t).astype(np.int64) <= m - 2
        hi = self.done + int(np.argmin(ok)) if not ok.all() else upper
        if hi <= self.done:
            return np.zeros((0, self.mean.shape[-1]), np.float32)
        rows = self._rows(self.done, hi)
        self.done = hi
        return rows

    def append_final(self, log_mel, energy):
        """Append the tail mel rows produced by _MelStream.finish without
        emitting interior rows (finish() resamples them with end clipping)."""
        if len(log_mel):
            self.log_mel = np.concatenate([self.log_mel, log_mel])
            self.energy = np.concatenate([self.energy, energy])

    def finish(self, n_frames, t_mel_final):
        """All remaining rows with the offline end-clipping semantics."""
        if n_frames <= self.done:
            return np.zeros((0, self.mean.shape[-1]), np.float32)
        rows = self._rows(self.done, n_frames, t_mel_final=t_mel_final)
        self.done = n_frames
        return rows


class _SpeechStream:
    """Speech-encoder frames with the k=31 replicate-conv lookahead
    (modules.py:253-260): frame i reads feature rows [i-15, i+15],
    clamped to the sequence ends."""

    LOOK = 15  # (31 - 1) / 2

    def __init__(self, params, fn_cache=None, grain=1):
        self.params = params
        self.feats = None  # (n, F) normalized rows
        self.done = 0
        # grain: see _MelStream — mid-stream consume threshold + finish
        # pad-and-slice bucket (batched-dispatch mode)
        self.grain = int(grain)
        self._fns = fn_cache if fn_cache is not None else {}

    def _fn(self, n):
        if ("speech", n) not in self._fns:
            p = self.params

            @jax.jit
            def fn(x):  # (n + 30, F) -> (n, S)
                h = L.elu(L.conv1d(p["conv0"], x[None]))  # k=1: padding is moot
                y = jax.lax.conv_general_dilated(
                    h, p["conv1"]["w"], window_strides=(1,), padding="VALID",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                ) + p["conv1"]["b"]
                return L.elu(L.linear(p["linear"], L.elu(y)))[0]

            self._fns[("speech", n)] = fn
        return self._fns[("speech", n)]

    def _emit(self, hi, end_idx, flush=False):
        outs = []
        while self.done < hi:
            rem = hi - self.done
            if flush and rem < self.grain:
                # pad-and-slice the tail through the grain-sized program:
                # the index clamp reproduces the offline replicate-conv end
                # semantics exactly, and rows past `rem` are discarded
                idx = np.clip(np.arange(self.done - self.LOOK,
                                        self.done + self.grain + self.LOOK),
                              0, end_idx)
                out = np.asarray(self._fn(self.grain)(jnp.asarray(self.feats[idx])))
                outs.append(out[:rem])
                self.done += rem
                break
            n = _largest_bucket(_SPEECH_BUCKETS, rem)
            if n == 0 or (not flush and n < self.grain):
                break
            idx = np.clip(np.arange(self.done - self.LOOK, self.done + n + self.LOOK), 0, end_idx)
            outs.append(np.asarray(self._fn(n)(jnp.asarray(self.feats[idx]))))
            self.done += n
        if not outs:
            # None, not a (0, 0) placeholder: the feature dim is unknown
            # here, and a zero-width array would poison the session's
            # speech-row concatenation (grain gating makes empty emits
            # routine mid-stream)
            return None
        return np.concatenate(outs)

    def push(self, rows):
        self.feats = rows if self.feats is None else np.concatenate([self.feats, rows])
        # frame i needs rows through i+15 and must not touch the (unknown)
        # end clamp: safe while i + LOOK <= len-1
        hi = len(self.feats) - self.LOOK
        if hi <= self.done:
            return None
        return self._emit(hi, len(self.feats) + 10**9)  # no end clamp yet

    def finish(self, n_frames):
        assert self.feats is not None and len(self.feats) == n_frames
        if self.done >= n_frames:
            return None
        return self._emit(n_frames, n_frames - 1, flush=True)


class StreamingSession:
    """Incremental gesture synthesis against a loaded `GesturePipeline`.

    Usage:
        sess = pipe.streaming_session(styles=[(bvh, (0, 256))],
                                      first_pose=bvh)
        for chunk in audio_chunks:          # float32 @ cfg.sampling_rate
            new = sess.push(chunk)          # dict of new frames (may be empty)
        tail = sess.finish()
        sess.write_bvh(out_dir, "clip")     # or use sess.result()

    Frames come out as numpy arrays keyed root_pos (n, 3), root_rot (n, 4),
    lpos (n, J, 3), ltxy (n, J, 2, 3); frame 0 (the first-pose state) is
    emitted immediately at construction, exactly like the offline rollout.

    Restrictions vs generate_gesture: style blending is "add" only
    ("stitch" needs the total clip length up front), and the 'normal'
    recurrent cell (the v1/v2 shipping config).
    """

    def __init__(self, pipe, styles, first_pose=None, blend_ratio=(0.5, 0.5),
                 temperature=1.0, seed=1234, gain=1.0, quantum=1):
        """quantum: don't run decoder chunks smaller than this mid-stream
        (finish() always flushes). >1 trades a few frames of extra lag for
        fewer dispatches — useful when per-dispatch overhead is high
        (e.g. the axon tunnel's ~25 ms)."""
        if pipe.opts.net.decoder.rnn_cond != "normal":
            raise NotImplementedError("streaming supports the 'normal' decoder cell")
        self.pipe = pipe
        self.quantum = int(quantum)
        # batched-dispatch mode (quantum >= 16, the serving default): apply
        # consume grains to the mel/speech stages too and pad-and-slice the
        # finish tails, so a session runs on FOUR device programs total
        # (mel 32 + 8, speech 16, decoder 16) at ~5 dispatches per 0.5 s
        # push — instead of ~12 programs / ~10 dispatches when every
        # sub-grain remainder descends the bucket ladder. quantum < 16
        # keeps the fine-grained ladder for lowest mid-stream latency.
        batched = self.quantum >= 16
        self._grain_dec = 16 if batched else 1
        # pipeline-owned jit cache shared across sessions: a per-session
        # @jax.jit closure is a NEW program object, so every session would
        # re-load each bucket executable through the device tunnel
        # (~seconds each — measured warm-session ttff 14.5 s / finish 17 s
        # before this cache; ~0.6 s / ~0.9 s after)
        if not hasattr(pipe, "_stream_fn_cache"):
            pipe._stream_fn_cache = {}
        self._dec_fns = pipe._stream_fn_cache
        self._mel = _MelStream(pipe.mel_cfg, gain=gain,
                               fn_cache=pipe._stream_fn_cache,
                               grain=8 if batched else 1)
        self._resample = _Resampler(
            pipe.mel_cfg, 60, pipe.audio_feature_type,
            pipe.stats["audio_input_mean"], pipe.stats["audio_input_std"],
        )
        self._speech = _SpeechStream(pipe.networks["speech_encoder"],
                                     fn_cache=pipe._stream_fn_cache,
                                     grain=16 if batched else 1)
        self.finished = False

        style_enc, last_feats = self._resolve_styles(styles, blend_ratio, temperature, seed)
        self.style = style_enc  # (1, C)

        if first_pose is not None:
            if isinstance(first_pose, (str, Path)):
                anim = bvh_io.load(first_pose)
                with host_cpu():
                    feats0 = F.preprocess_animation(anim)
            elif isinstance(first_pose, dict):
                with host_cpu():
                    feats0 = F.preprocess_animation(dict(first_pose))
            else:
                feats0 = first_pose  # AnimFeatures
        else:
            feats0 = last_feats
            assert feats0 is not None, "no first pose available"

        f = feats0
        self._gaze0 = jnp.asarray(np.asarray(f.gaze_pos[0], np.float32))[None]  # (1, 3)
        state0 = tuple(
            jnp.asarray(np.asarray(x[0], np.float32))[None]
            for x in (f.root_pos, f.root_rot, f.root_vel, f.root_vrt,
                      f.lpos, f.ltxy, f.lvel, f.lvrt)
        )
        dec_cfg = pipe.opts.net.decoder
        self._carry = decoder.init_carry(
            pipe.networks["decoder"], *state0, self._gaze0, self.style,
            pipe.stats["anim_input_mean"], pipe.stats["anim_input_std"],
            dec_cfg.num_rnn_layers,
        )
        self._speech_rows = None  # (n, S) encodings, row 0 unused by the scan
        self._steps_done = 0
        # frame 0 == the first-pose state, exactly like the offline rollout
        self._out = [{
            "root_pos": np.asarray(state0[0]), "root_rot": np.asarray(state0[1]),
            "lpos": np.asarray(state0[4]), "ltxy": np.asarray(state0[5]),
        }]
        self.frames_emitted = 1

    # -- style resolution (mirrors generate_gesture's key sequence) ---------

    def _resolve_styles(self, styles, blend_ratio, temperature, seed):
        pipe = self.pipe
        rng = jax.random.PRNGKey(seed)
        encs, last_feats = [], None
        if isinstance(styles, (np.ndarray, jnp.ndarray)):
            arr = jnp.asarray(styles, jnp.float32)
            return (arr if arr.ndim == 2 else arr[None]), None
        for style in styles:
            if pipe.style_encoding_type == "label":
                encs.append(pipe.label_encoding(style))
            elif isinstance(style, (tuple, list)) and isinstance(style[0], (str, Path)):
                vec, feats = pipe.style_example_from_bvh(style[0], style[1])
                last_feats = feats
                rng, sub = jax.random.split(rng)
                emb, _, _ = pipe.encode_style(vec, temperature, sub)
                encs.append(emb)
            elif isinstance(style, np.ndarray):
                encs.append(jnp.asarray(style, jnp.float32)[None])
            else:
                raise ValueError(f"bad style spec {style!r}")
        if len(encs) > 1:
            assert len(encs) == len(blend_ratio)
            stacked = jnp.stack(encs, axis=1)
            return jnp.einsum("bnc,n->bc", stacked, jnp.asarray(blend_ratio, jnp.float32)), last_feats
        return encs[0], last_feats

    # -- decoder chunks ------------------------------------------------------

    def _dec_fn(self, n):
        if ("dec", n) not in self._dec_fns:
            pipe = self.pipe
            dec_cfg = pipe.opts.net.decoder

            @jax.jit
            def fn(carry, gaze, speech, style):
                return decoder.rollout_chunk(
                    pipe.networks["decoder"], carry, gaze, speech, style,
                    pipe.stats["anim_input_mean"], pipe.stats["anim_input_std"],
                    pipe.stats["anim_output_mean"], pipe.stats["anim_output_std"],
                    pipe.dt, num_rnn_layers=dec_cfg.num_rnn_layers,
                    output_indices=(0, 1, 4, 5),
                )

            self._dec_fns[("dec", n)] = fn
        return self._dec_fns[("dec", n)]

    def _advance_decoder(self, flush=False):
        if self._speech_rows is None:
            return
        emitted = []
        grain = self._grain_dec
        # scan step t consumes speech row 1 + steps_done + ...
        while True:
            avail = (len(self._speech_rows) - 1) - self._steps_done
            if flush and 0 < avail < grain:
                # pad-and-slice the tail through the grain-sized program:
                # the scan computes the `avail` true steps first, so the
                # zero-padded speech rows only pollute the discarded steps
                # (and the carry, which is dead after finish)
                lo = 1 + self._steps_done
                sp = self._speech_rows[lo:]
                sp = np.concatenate(
                    [sp, np.zeros((grain - avail, sp.shape[-1]), sp.dtype)])
                speech = jnp.asarray(sp)[None]
                gaze = jnp.broadcast_to(self._gaze0[:, None], (1, grain, 3))
                style = jnp.broadcast_to(self.style[:, None], (1, grain, self.style.shape[-1]))
                self._carry, out = self._dec_fn(grain)(self._carry, gaze, speech, style)
                emitted.append(tuple(o[:, :avail] for o in out[:4]))
                self._steps_done += avail
                break
            n = _largest_bucket(_DECODER_BUCKETS, avail)
            if n == 0 or (not flush and n < self.quantum):
                break
            lo = 1 + self._steps_done
            speech = jnp.asarray(self._speech_rows[lo : lo + n])[None]
            gaze = jnp.broadcast_to(self._gaze0[:, None], (1, n, 3))
            style = jnp.broadcast_to(self.style[:, None], (1, n, self.style.shape[-1]))
            self._carry, out = self._dec_fn(n)(self._carry, gaze, speech, style)
            emitted.append(out)
            self._steps_done += n
        # one batched pull for all chunks emitted this call (per-array
        # np.asarray round-trips cost ~0.27 s each through the tunnel)
        emitted = jax.device_get([tuple(o[:4]) for o in emitted])
        for out in emitted:
            entry = {
                "root_pos": out[0][0], "root_rot": out[1][0],
                "lpos": out[2][0], "ltxy": out[3][0],
            }
            self._out.append(entry)  # every entry holds (n, ...) arrays
            self.frames_emitted += entry["root_pos"].shape[0]

    # -- public ---------------------------------------------------------------

    @property
    def samples_received(self):
        """Total raw audio samples pushed so far (drives the offline frame
        count at finish; lets callers reject finishing an empty stream)."""
        return self._mel.n_samples

    def push(self, audio_chunk):
        """Feed raw samples; returns the dict of NEW gesture frames."""
        assert not self.finished
        before = len(self._out)
        log_mel, energy = self._mel.push(audio_chunk)
        if len(log_mel):
            rows = self._resample.push(log_mel, energy)
            if len(rows):
                enc = self._speech.push(rows)
                if enc is not None:
                    self._speech_rows = enc if self._speech_rows is None else np.concatenate([self._speech_rows, enc])
        self._advance_decoder()
        return self._collect(before)

    def finish(self):
        """Flush all lookaheads; returns the final new frames."""
        assert not self.finished
        before = len(self._out)
        n_frames = int(round(60.0 * (self._mel.n_samples / self.pipe.mel_cfg.sampling_rate)))
        log_mel, energy = self._mel.finish()
        t_mel = self._mel.total_frames()
        self._resample.append_final(log_mel, energy)
        rows = self._resample.finish(n_frames, t_mel)
        if len(rows):
            enc = self._speech.push(rows)
            if enc is not None:
                self._speech_rows = enc if self._speech_rows is None else np.concatenate([self._speech_rows, enc])
        tail_enc = self._speech.finish(n_frames)
        if tail_enc is not None:
            self._speech_rows = tail_enc if self._speech_rows is None else np.concatenate([self._speech_rows, tail_enc])
        self._advance_decoder(flush=True)
        assert self.frames_emitted == n_frames, (
            f"emitted {self.frames_emitted} frames, offline would emit {n_frames}"
        )
        self.finished = True
        return self._collect(before)

    def _collect(self, before):
        """Concatenate the (n, ...) per-chunk entries appended since `before`."""
        frames = self._out[before:]
        keys = ("root_pos", "root_rot", "lpos", "ltxy")
        if not frames:
            J = self.pipe.njoints
            tails = {"root_pos": (3,), "root_rot": (4,), "lpos": (J, 3), "ltxy": (J, 2, 3)}
            return {k: np.zeros((0,) + tails[k], np.float32) for k in keys}
        return {k: np.concatenate([f[k] for f in frames]) for k in keys}

    def result(self):
        """Stacked (1, T, ...) trajectories: root_pos (1,T,3), root_rot
        (1,T,4), lpos (1,T,J,3) and rot6d ltxy (1,T,J,2,3). Note
        GesturePipeline.rollout returns device-converted quaternions for the
        joint rotations instead of ltxy; write_result accepts both layouts
        (ndim dispatch), so both feed write_bvh identically."""
        full = self._collect(0)
        return tuple(jnp.asarray(full[k])[None] for k in ("root_pos", "root_rot", "lpos", "ltxy"))

    def write_bvh(self, results_path, file_name, audio_file=None):
        assert self.finished, "call finish() first"
        return self.pipe.write_result(results_path, file_name, self.result(), audio_file)
