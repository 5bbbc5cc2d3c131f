"""Pallas TPU kernel: fused iSTFT (inverse rDFT matmul + window +
overlap-add) with frames kept in VMEM.

The XLA path (ops/stft.py istft) materializes the (B, T_f, n_fft) frame
tensor in HBM between the iDFT matmul and the overlap-add; this kernel keeps
frames in VMEM: spectrogram tile -> MXU matmuls against the window-folded
iDFT matrices -> k lane-sliced, sublane-shifted adds -> (B, T_out, hop)
blocks. The final flatten/center-trim/envelope-divide happens outside (cheap
elementwise on the audio-sized output).

Mosaic constraints shape the design: lane-dimension reshapes/slices must be
128-aligned, so the kernel requires hop_length % 128 == 0 (true for the
512/256 and 256/128 branches at 24 kHz and all 44.1 kHz branches); smaller
hops fall back to the XLA path via `supported()`.

Numerics match `ops.stft.istft(..., method='matmul')`; tested in interpret
mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from flow2gan_tpu.ops.stft import _irdft_matrices, _istft_envelope, hann_window_np


# Trace-time escape hatch: inside a lax.while/scan body, XLA:TPU stack-
# allocates a tpu_custom_call's operands AND results in scoped VMEM (16 MB
# limit on v5e). At 44.1 kHz shapes (e.g. batch 16, t_f 521, n_fft 256) the
# combined buffers are ~16.8 MB, so compiling the scanned Euler rollout with
# this kernel inside fails with "Ran out of memory in memory space vmem ...
# allocating on stack". Callers that trace the kernel inside loop control
# flow wrap the trace in `disabled()`; `_pallas_enabled` checks is_disabled()
# and falls back to the XLA iSTFT (identical numerics, HBM-resident frames).
_DISABLED: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "flow2gan_pallas_istft_disabled", default=False
)


@contextlib.contextmanager
def disabled():
    """Disable the Pallas iSTFT for any model traced inside this context."""
    tok = _DISABLED.set(True)
    try:
        yield
    finally:
        _DISABLED.reset(tok)


def is_disabled() -> bool:
    return _DISABLED.get()


def supported(n_fft: int, hop_length: int) -> bool:
    return (
        n_fft % hop_length == 0
        and hop_length % 128 == 0
        and n_fft % 128 == 0
    )


def _istft_kernel(re_ref, im_ref, aw_ref, bw_ref, out_ref, *, hop: int,
                  n_fft: int):
    r = re_ref.shape[0]
    t_f = re_ref.shape[1]
    k = n_fft // hop
    t_out = t_f + k - 1
    for i in range(r):  # static unroll over the batch rows of this block
        # HIGHEST precision: full-f32 DFT on the MXU (default bf16 inputs
        # would cost ~1e-3 relative error in the waveform)
        frames = jnp.dot(
            re_ref[i],
            aw_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + jnp.dot(
            im_ref[i],
            bw_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # overlap-add: k lane slices (128-aligned), each shifted j frames
        # down the sublane (frame) axis
        acc = None
        for j in range(k):
            fj = frames[:, j * hop : (j + 1) * hop]  # (t_f, hop)
            shifted = jnp.pad(fj, ((j, k - 1 - j), (0, 0)))  # (t_out, hop)
            acc = shifted if acc is None else acc + shifted
        out_ref[i] = acc


def istft_pallas(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    length: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused iSTFT of complex (B, T_f, F) -> (B, length).

    Semantics match ops.stft.istft (center=True, periodic Hann). Requires
    `supported(n_fft, hop_length)`; callers should fall back to ops.stft.istft
    otherwise. Differentiable: iSTFT is linear, so the VJP reuses the XLA
    path's adjoint (Pallas kernels have no autodiff rule of their own) —
    training configs may therefore enable use_pallas_istft too.
    """
    if not supported(n_fft, hop_length):
        raise NotImplementedError(
            f"istft_pallas requires 128-aligned hop (got n_fft={n_fft}, "
            f"hop={hop_length}); use ops.stft.istft"
        )
    return _istft_pallas_diff(spec, n_fft, hop_length, length, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _istft_pallas_diff(spec, n_fft, hop_length, length, interpret):
    return _istft_pallas_impl(spec, n_fft, hop_length, length, interpret)


def _istft_pallas_diff_fwd(spec, n_fft, hop_length, length, interpret):
    out = _istft_pallas_impl(spec, n_fft, hop_length, length, interpret)
    return out, spec.shape


def _istft_pallas_diff_bwd(n_fft, hop_length, length, interpret, spec_shape, g):
    from flow2gan_tpu.ops.stft import istft

    # iSTFT is linear: its VJP is input-independent, so evaluate the XLA
    # implementation's adjoint at zero
    zero = jnp.zeros(spec_shape, jnp.complex64)
    _, vjp_fn = jax.vjp(
        lambda s: istft(s, n_fft, hop_length, length=length, method="matmul"),
        zero,
    )
    (ds,) = vjp_fn(g)
    return (ds,)


_istft_pallas_diff.defvjp(_istft_pallas_diff_fwd, _istft_pallas_diff_bwd)


def _istft_pallas_impl(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    length: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t_f, f = spec.shape
    assert f == n_fft // 2 + 1, (f, n_fft)
    b_pad = (-b) % 8
    if b_pad:
        spec = jnp.pad(spec, ((0, b_pad), (0, 0), (0, 0)))
    bp = b + b_pad
    k = n_fft // hop_length
    t_out = t_f + k - 1
    default_len = (t_f - 1) * hop_length
    out_len = default_len if length is None else min(length, default_len)

    window = hann_window_np(n_fft)
    A, B = _irdft_matrices(n_fft)
    aw = jnp.asarray(A * window[None, :])
    bw = jnp.asarray(B * window[None, :])

    r = 8
    kernel = functools.partial(_istft_kernel, hop=hop_length, n_fft=n_fft)
    blocks = pl.pallas_call(
        kernel,
        grid=(bp // r,),
        in_specs=[
            pl.BlockSpec((r, t_f, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, t_f, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((f, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((f, n_fft), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r, t_out, hop_length), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, t_out, hop_length), jnp.float32),
        interpret=interpret,
    )(spec.real, spec.imag, aw, bw)

    start = n_fft // 2
    flat = blocks[:b].reshape(b, t_out * hop_length)
    y = jax.lax.slice_in_dim(flat, start, start + out_len, axis=1)
    inv_env = jnp.asarray(1.0 / _istft_envelope(t_f, n_fft, hop_length)[:out_len])
    y = y * inv_env[None, :]
    if length is not None and length > out_len:
        y = jnp.pad(y, ((0, 0), (0, length - out_len)))
    return y
