"""WAV read/write with pure-Python resampling.

Replaces the reference's sox/ffmpeg binary dependency
(ZEGGS/audio/audio_files.py:88-163 probes sox and shells out on format
mismatch) with `scipy.signal.resample_poly` — no external binaries.

Rescale semantics follow audio_files.py:211-236: int16/32768, int32/2^31,
uint8 offset-binary, floats asserted in [-1, 1].
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def _rescale_to_float32(x):
    if x.dtype == np.int16:
        return (x / 32768.0).astype(np.float32)
    if x.dtype == np.int32:
        return (x / 2147483648.0).astype(np.float32)
    if x.dtype in (np.float32, np.float64):
        if np.max(np.abs(x)) > 1.0:
            raise ValueError("float wav contains samples outside [-1, 1]")
        return x.astype(np.float32)
    if x.dtype == np.uint8:
        return (((x / 255.0) - 0.5) * 2.0).astype(np.float32)
    raise TypeError(f"unsupported wav sample type {x.dtype}")


def read_wavfile(
    file_path,
    rescale=True,
    desired_fs=None,
    desired_nb_channels=None,
    out_type="float32",
    logger=None,
):
    """Read a WAV file -> (fs, samples float32 in [-1, 1]).

    On sample-rate mismatch the audio is polyphase-resampled in-process;
    multi-channel audio is averaged to mono when desired_nb_channels == 1
    (or always when a channel count of 1 is implied by downstream use).
    """
    fs, x = wavfile.read(str(file_path))
    if rescale:
        x = _rescale_to_float32(x)
    else:
        x = np.asarray(x).astype(out_type)

    if x.ndim == 2:
        if desired_nb_channels in (None, 1):
            x = x.mean(axis=1).astype(np.float32)
        elif x.shape[1] != desired_nb_channels:
            raise ValueError(f"wav has {x.shape[1]} channels, wanted {desired_nb_channels}")

    if desired_fs is not None and fs != desired_fs:
        g = np.gcd(int(fs), int(desired_fs))
        x = resample_poly(x, desired_fs // g, fs // g).astype(np.float32)
        fs = desired_fs
    return fs, x


def write_wavefile(file_path, pcm_data, sampling_rate, out_type="int16"):
    """Write samples; floats in [-1, 1] scale to int16 by 2**15
    (audio_files.py:166-181)."""
    data = np.asarray(pcm_data)
    if data.dtype.kind == "f" and out_type == "int16":
        data = data * 2**15
    wavfile.write(str(file_path), sampling_rate, data.astype(out_type))
