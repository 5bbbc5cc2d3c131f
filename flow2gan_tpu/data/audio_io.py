"""Host-side audio I/O: minimal dependency-free WAV read/write + resampling.

Replaces the reference's torchaudio/libsndfile/sox host pipeline
(/root/reference/flow2gan/dataset.py:96-175) with numpy + scipy (polyphase
resampling). PCM16/24/32 and float32 WAV are supported, which covers LibriTTS
and the bundled test fixtures.
"""

from __future__ import annotations

import struct
import wave
from pathlib import Path
from typing import Tuple, Union

import numpy as np

Pathlike = Union[str, Path]


def read_wav(path: Pathlike) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 samples in [-1, 1], sample_rate).

    Multi-channel audio is returned as (channels, time) — same convention as
    torchaudio.load. Mono is returned as (1, time).
    """
    path = str(path)
    with open(path, "rb") as f:
        header = f.read(12)
    if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
        raise ValueError(f"not a WAV file: {path}")

    # Walk chunks manually so we can handle float32 WAVs (wave module can't).
    with open(path, "rb") as f:
        f.seek(12)
        fmt = None
        data = None
        while True:
            head = f.read(8)
            if len(head) < 8:
                break
            cid, size = struct.unpack("<4sI", head)
            if cid == b"fmt ":
                fmt = f.read(size)
            elif cid == b"data":
                data = f.read(size)
            else:
                f.seek(size + (size & 1), 1)
            if fmt is not None and data is not None:
                break
    if fmt is None or data is None:
        raise ValueError(f"malformed WAV file: {path}")

    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = struct.unpack("<H", fmt[24:26])[0]

    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int8).astype(np.int32) << 16)
            ).astype(np.float32) / 8388608.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}: {path}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits}: {path}")
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}: {path}")

    if n_channels > 1:
        x = x.reshape(-1, n_channels).T
    else:
        x = x[None, :]
    return np.ascontiguousarray(x), sample_rate


def write_wav(path: Pathlike, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 (time,) or (channels, time) audio as PCM16 WAV."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None, :]
    n_channels = audio.shape[0]
    # scale by 32768 (the readers' convention) and clamp, so read(write(x))
    # round-trips within 0.5 LSB
    pcm = np.clip(np.rint(audio * 32768.0), -32768, 32767)
    pcm = pcm.astype("<i2").T.reshape(-1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling along the last axis (host-side, scipy)."""
    if orig_sr == target_sr:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(
        np.float32
    )


def peak_normalize_db(audio: np.ndarray, db: float) -> np.ndarray:
    """sox-`norm`-style peak normalization to `db` dBFS.

    Replaces `sox norm` gain augmentation (reference dataset.py:164-168).
    """
    peak = np.abs(audio).max()
    if peak <= 0:
        return audio
    target = 10.0 ** (db / 20.0)
    return (audio * (target / peak)).astype(np.float32)
