"""TPU-native STFT / iSTFT.

Functionally matches `torch.stft` / `torch.istft` with ``center=True``,
periodic Hann window, onesided output (reference usage:
/root/reference/flow2gan/models/modules.py:52-116), but is designed for XLA:

- framing is done with static reshapes + shifted slices (no gathers) when
  ``n_fft % hop_length == 0`` (true for every config in this framework);
- overlap-add is k static shifted adds (k = n_fft // hop), which XLA fuses;
- the window-envelope normalization of iSTFT is folded into a precomputed
  1-D envelope (a deterministic function of (n_frames, n_fft, hop)), so the
  hot path is irfft + window multiply + k adds + one divide.

Internal layout is time-major: spectrograms are ``(batch, frames, freq)``
(freq on the last, lane, dimension). The reference uses (batch, freq, frames);
transposition happens only at public API boundaries.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window_np(win_length: int) -> np.ndarray:
    """Periodic Hann window as numpy (trace-time safe), the single source of
    truth for every window in this framework."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, identical to torch.hann_window(win_length)."""
    return jnp.asarray(hann_window_np(win_length), dtype=dtype)


def num_frames(length: int, hop_length: int) -> int:
    """Frame count of a center-padded STFT: 1 + length // hop.

    Matches reference modules.py:80 (`spec_lens = 1 + len // hop`).
    """
    return 1 + length // hop_length


def _frame_reshape(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Frame (..., L_padded) into (..., n_frames, n_fft) without gathers.

    Requires n_fft % hop == 0. L_padded must satisfy
    (L_padded - n_fft) % hop == 0.
    """
    k = n_fft // hop
    L = x.shape[-1]
    n_frames = (L - n_fft) // hop + 1
    n_blocks = L // hop
    # pad so the block view covers the tail (frames never index past n_frames)
    if n_blocks * hop < L:
        raise ValueError("padded length must be a multiple of hop")
    blocks = x.reshape(*x.shape[:-1], n_blocks, hop)
    # frame i = blocks[i : i + k]  ->  stack k shifted views
    parts = [
        jax.lax.slice_in_dim(blocks, j, j + n_frames, axis=-2) for j in range(k)
    ]
    frames = jnp.stack(parts, axis=-2)  # (..., n_frames, k, hop)
    return frames.reshape(*x.shape[:-1], n_frames, n_fft)


def frame_signal(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Slice (..., L) into overlapping frames (..., n_frames, n_fft).

    With center=True, pads n_fft//2 on both sides (reflect, like torch.stft)
    and additionally zero-pads the tail so that framing can use pure reshapes.
    """
    if n_fft % hop_length != 0:
        raise NotImplementedError(
            "frame_signal requires n_fft % hop_length == 0 "
            f"(got n_fft={n_fft}, hop={hop_length})"
        )
    L = x.shape[-1]
    if center:
        pad = n_fft // 2
        cfg = [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, cfg + [(pad, pad)], mode=pad_mode)
        n_fr = num_frames(L, hop_length)
    else:
        n_fr = (L - n_fft) // hop_length + 1
    # zero-pad tail to a multiple of hop covering the last frame
    needed = (n_fr - 1) * hop_length + n_fft
    cur = x.shape[-1]
    if needed > cur:
        cfg = [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, cfg + [(0, needed - cur)])
    elif needed < cur:
        x = x[..., :needed]
    # ensure multiple of hop for the reshape trick
    total = x.shape[-1]
    if total % hop_length != 0:
        cfg = [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, cfg + [(0, hop_length - total % hop_length)])
    return _frame_reshape(x, n_fft, hop_length)


@functools.lru_cache(maxsize=32)
def _rdft_matrices(n_fft: int):
    """Forward rDFT as two matmul matrices (n_fft, F): X = x@C + i x@S.

    On TPU, a (frames, n_fft) x (n_fft, F) matmul on the MXU beats the
    generic XLA FFT for vocoder-sized transforms (n_fft 128..2048) and fuses
    with the surrounding network matmuls ("GEMM-native DFT").
    """
    F = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(F)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _irdft_matrices(n_fft: int):
    """Inverse onesided rDFT as two matmuls (F, n_fft):
    x = Re @ A + Im @ B, with the DC/Nyquist bins weighted once."""
    F = n_fft // 2 + 1
    k = np.arange(F)[:, None].astype(np.float64)
    n = np.arange(n_fft)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((F, 1), 2.0)
    c[0, 0] = 1.0
    if n_fft % 2 == 0:
        c[-1, 0] = 1.0
    A = (c * np.cos(ang) / n_fft).astype(np.float32)
    B = (-c * np.sin(ang) / n_fft).astype(np.float32)
    return A, B


def _use_matmul_dft(method: str) -> bool:
    if method == "matmul":
        return True
    if method == "fft":
        return False
    # auto: MXU matmul-DFT on TPU, XLA FFT elsewhere
    import jax

    return jax.default_backend() == "tpu"


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    method: str = "auto",
) -> jnp.ndarray:
    """Onesided STFT of (..., L) -> complex (..., n_frames, n_fft//2 + 1).

    Numerically equivalent to torch.stft(..., center=True, onesided=True,
    return_complex=True) up to a (frames, freq) transpose. `method` selects
    the transform backend: 'fft' (XLA FFT), 'matmul' (MXU rDFT matmul), or
    'auto' (matmul on TPU).
    """
    if window is None:
        window = hann_window(n_fft, x.dtype)
    frames = frame_signal(x, n_fft, hop_length, center=center, pad_mode=pad_mode)
    frames = (frames * window).astype(jnp.float32)
    if _use_matmul_dft(method):
        C, S = _rdft_matrices(n_fft)
        re = jnp.dot(frames, jnp.asarray(C), precision=jax.lax.Precision.HIGHEST)
        im = jnp.dot(frames, jnp.asarray(S), precision=jax.lax.Precision.HIGHEST)
        return jax.lax.complex(re, im)
    return jnp.fft.rfft(frames, axis=-1)


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add (..., n_frames, n_fft) -> (..., (n_frames-1)*hop + n_fft).

    Uses k = n_fft // hop shifted adds of contiguous reshaped blocks.
    """
    *lead, n_frames, n_fft = frames.shape
    k = n_fft // hop
    if k * hop != n_fft:
        raise NotImplementedError("overlap-add requires n_fft % hop == 0")
    out_len = (n_frames - 1) * hop + n_fft
    # split each frame into k hop-sized chunks: (..., n_frames, k, hop)
    fr = frames.reshape(*lead, n_frames, k, hop)
    flat_len = n_frames * hop
    cfg = [(0, 0)] * len(lead)
    out = None
    for j in range(k):
        chunk = fr[..., :, j, :].reshape(*lead, flat_len)
        padded = jnp.pad(chunk, cfg + [(j * hop, out_len - j * hop - flat_len)])
        out = padded if out is None else out + padded
    return out


@functools.lru_cache(maxsize=64)
def _istft_envelope(n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    """Precomputed OLA window-square envelope for iSTFT normalization.

    Returns the envelope over the *trimmed* output range
    [n_fft//2, n_fft//2 + (n_frames-1)*hop), as float32 numpy (becomes an XLA
    constant, computed once per shape).
    """
    w = hann_window_np(n_fft).astype(np.float64) ** 2
    out_len = (n_frames - 1) * hop + n_fft
    env = np.zeros(out_len, dtype=np.float64)
    for i in range(n_frames):
        env[i * hop : i * hop + n_fft] += w
    start = n_fft // 2
    env = env[start : start + (n_frames - 1) * hop]
    # NOLA guard: torch.istft asserts a nonzero envelope; our configs always
    # satisfy NOLA, tiny epsilon only protects the very edges.
    env = np.maximum(env, 1e-11)
    return env.astype(np.float32)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: Optional[jnp.ndarray] = None,
    length: Optional[int] = None,
    method: str = "auto",
) -> jnp.ndarray:
    """Inverse of `stft` (center=True), matching torch.istft semantics.

    Args:
      spec: complex (..., n_frames, n_fft//2 + 1).
      length: output length; default (n_frames - 1) * hop (torch default).
      method: 'fft' | 'matmul' | 'auto' (matmul-iDFT on the MXU on TPU).

    Returns: real (..., length).
    """
    if window is None:
        window = hann_window(n_fft, jnp.float32)
    else:
        raise NotImplementedError(
            "istft only supports the periodic Hann window: the OLA "
            "normalization envelope is precomputed for it (torch.istft "
            "recomputes it per window; extend _istft_envelope if needed)"
        )
    n_frames = spec.shape[-2]
    if _use_matmul_dft(method):
        A, B = _irdft_matrices(n_fft)
        frames = jnp.dot(
            spec.real, jnp.asarray(A), precision=jax.lax.Precision.HIGHEST
        ) + jnp.dot(spec.imag, jnp.asarray(B), precision=jax.lax.Precision.HIGHEST)
    else:
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    frames = frames * window
    y = _overlap_add(frames, hop_length)
    default_len = (n_frames - 1) * hop_length
    start = n_fft // 2
    y = jax.lax.slice_in_dim(y, start, start + default_len, axis=-1)
    env = jnp.asarray(_istft_envelope(n_frames, n_fft, hop_length))
    y = y / env
    if length is not None:
        if length <= default_len:
            y = y[..., :length]
        else:
            cfg = [(0, 0)] * (y.ndim - 1)
            y = jnp.pad(y, cfg + [(0, length - default_len)])
    return y


def spec_to_real(spec: jnp.ndarray) -> jnp.ndarray:
    """Pack complex (..., T, F) as real (..., T, 2F): [Re | Im] on channels.

    Channel order matches the reference `fft_to_real`
    (modules.py:31-38: real block then imag block).
    """
    return jnp.concatenate([spec.real, spec.imag], axis=-1)


def real_to_spec(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `spec_to_real`: real (..., T, 2F) -> complex (..., T, F)."""
    f = x.shape[-1] // 2
    return jax.lax.complex(x[..., :f], x[..., f:])


def stft_lens(audio_lens: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Valid-frame counts: 1 + lens // hop (reference modules.py:80)."""
    return 1 + audio_lens // hop_length
