"""Mel / linear-filterbank spectrogram frontends.

Numerically matches torchaudio's `MelSpectrogram` (HTK mel scale, norm=None,
f_min=0, f_max=sr/2 defaults) and `functional.linear_fbanks`, which the
reference uses for conditioning features and the spectral-scaled FM loss
(/root/reference/flow2gan/models/modules.py:119-214). Bit-level parity of the
mel frontend is what makes torch checkpoints convert losslessly; it is golden-
tested against the bundled `test_data/mel/*.pt` fixtures.

Layout convention: functions return (batch, n_filters, frames) to mirror the
reference public API; internal math is time-major (frames, freq).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from flow2gan_tpu.ops.stft import stft as _stft
from flow2gan_tpu.utils import safe_log


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """HTK mel scale: 2595 log10(1 + f/700) (torchaudio default)."""
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def _triangular_filterbank(all_freqs: np.ndarray, f_pts: np.ndarray) -> np.ndarray:
    """Triangular filterbank (n_freqs, n_filters), torchaudio formulation."""
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_filter + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_filter + 2)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb


@functools.lru_cache(maxsize=32)
def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """HTK mel filterbank (n_freqs, n_mels), float32.

    Equivalent to torchaudio.functional.melscale_fbanks(norm=None,
    mel_scale='htk'); computed in float64 then cast, matching torchaudio's
    float32 output closely.
    """
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(f_min)
    m_max = _hz_to_mel(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    fb = _triangular_filterbank(all_freqs, f_pts)
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=32)
def linear_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_filter: int,
    sample_rate: int,
) -> np.ndarray:
    """Linear-frequency triangular filterbank (n_freqs, n_filter), float32.

    Equivalent to torchaudio.functional.linear_fbanks; used by the
    spectral-scaled FM loss (reference modules.py:194-200).
    """
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    f_pts = np.linspace(f_min, f_max, n_filter + 2)
    fb = _triangular_filterbank(all_freqs, f_pts)
    return fb.astype(np.float32)


def spectrogram(
    audio: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    power: Optional[float] = 2.0,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """|STFT|^power of (..., L) -> (..., frames, n_fft//2+1) (time-major!).

    power=None returns the complex STFT (torchaudio Spectrogram(power=None)).
    """
    spec = _stft(audio, n_fft, hop_length, center=center, pad_mode=pad_mode)
    if power is None:
        return spec
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag**power
    return mag


@dataclasses.dataclass(frozen=True)
class LogMelSpectrogram:
    """wav -> log-mel features; reference modules.py:119-143.

    __call__ takes (batch, L) and returns (batch, n_mels, frames) to match the
    reference conditioning layout.
    """

    sampling_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 100
    power: float = 1.0

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        mag = spectrogram(audio, self.n_fft, self.hop_length, power=self.power)
        fb = jnp.asarray(
            melscale_fbanks(
                n_freqs=self.n_fft // 2 + 1,
                f_min=0.0,
                f_max=float(self.sampling_rate // 2),
                n_mels=self.n_mels,
                sample_rate=self.sampling_rate,
            )
        )
        mel = mag @ fb  # (..., frames, n_mels)
        return safe_log(mel).swapaxes(-1, -2)  # (..., n_mels, frames)


@dataclasses.dataclass(frozen=True)
class MelSpectrogram:
    """Plain (non-log) mel magnitude; used by GAN mel-recon loss.

    Returns (batch, n_mels, frames); reference gan.py:45-55 uses power=1.
    """

    sampling_rate: int
    n_fft: int
    hop_length: int
    n_mels: int
    power: float = 1.0

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        mag = spectrogram(audio, self.n_fft, self.hop_length, power=self.power)
        fb = jnp.asarray(
            melscale_fbanks(
                n_freqs=self.n_fft // 2 + 1,
                f_min=0.0,
                f_max=float(self.sampling_rate // 2),
                n_mels=self.n_mels,
                sample_rate=self.sampling_rate,
            )
        )
        mel = mag @ fb
        return mel.swapaxes(-1, -2)


@dataclasses.dataclass(frozen=True)
class LinearFilterSpectrogram:
    """Linear triangular-filterbank power spectrogram; reference modules.py:146-214.

    Used only by the spectral-energy-scaled FM loss. Returns
    (batch, n_filter, frames).
    """

    sample_rate: int
    n_filter: int
    n_fft: int
    hop_length: Optional[int] = None
    f_min: float = 0.0
    f_max: Optional[float] = None
    power: float = 2.0

    @property
    def hop(self) -> int:
        return self.hop_length if self.hop_length is not None else self.n_fft // 2

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        mag = spectrogram(audio, self.n_fft, self.hop, power=self.power)
        f_max = self.f_max if self.f_max is not None else float(self.sample_rate // 2)
        fb = jnp.asarray(
            linear_fbanks(
                n_freqs=self.n_fft // 2 + 1,
                f_min=self.f_min,
                f_max=f_max,
                n_filter=self.n_filter,
                sample_rate=self.sample_rate,
            )
        )
        out = mag @ fb
        return out.swapaxes(-1, -2)
