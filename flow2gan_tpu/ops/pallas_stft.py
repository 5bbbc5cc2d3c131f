"""Pallas TPU kernel: fused STFT (framing + window + forward rDFT) with the
frame tensor kept in VMEM.

The XLA path materializes the (B, T_f, n_fft) windowed-frame tensor in HBM
before the DFT matmul; this kernel builds frames in VMEM from hop-sized
blocks (lane-concat of k sublane-shifted views — the exact inverse of the
pallas_istft overlap-add) and feeds the MXU directly with the window folded
into the DFT matrices.

Same Mosaic constraints as pallas_istft: 128-aligned hop required
(`supported()`); reflect/tail padding and the (B, L) -> (B, n_blocks, hop)
reshape happen outside the kernel (free in XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flow2gan_tpu.ops.stft import _rdft_matrices, hann_window_np, num_frames


def supported(n_fft: int, hop_length: int) -> bool:
    return (
        n_fft % hop_length == 0
        and hop_length % 128 == 0
        and n_fft % 128 == 0
    )


def _stft_kernel(blocks_ref, cw_ref, sw_ref, re_ref, im_ref, *, hop: int,
                 n_fft: int, t_f: int):
    r = blocks_ref.shape[0]
    k = n_fft // hop
    for i in range(r):  # static unroll over batch rows of this block
        b = blocks_ref[i]  # (n_blocks, hop)
        # frame t = blocks[t : t + k] flattened. Mosaic can't lane-concat
        # sublane-offset slices, so realign each shifted view to offset 0
        # with a circular roll first (rows beyond t_f are sliced away).
        n_blocks = b.shape[0]
        views = [
            (pltpu.roll(b, n_blocks - j, 0) if j else b)[:t_f, :]
            for j in range(k)
        ]
        frames = jnp.concatenate(views, axis=1)  # (t_f, n_fft)
        re_ref[i] = jnp.dot(
            frames,
            cw_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        im_ref[i] = jnp.dot(
            frames,
            sw_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def stft_pallas(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    pad_mode: str = "reflect",
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused onesided STFT of (B, L) -> complex (B, T_f, n_fft//2 + 1).

    Matches ops.stft.stft(center=True, method='matmul'). Requires
    `supported(n_fft, hop_length)`. Differentiable via the XLA path's adjoint
    (the STFT is linear).
    """
    if not supported(n_fft, hop_length):
        raise NotImplementedError(
            f"stft_pallas requires 128-aligned hop (got n_fft={n_fft}, "
            f"hop={hop_length}); use ops.stft.stft"
        )
    return _stft_pallas_diff(x, n_fft, hop_length, pad_mode, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _stft_pallas_diff(x, n_fft, hop_length, pad_mode, interpret):
    return _stft_pallas_impl(x, n_fft, hop_length, pad_mode, interpret)


def _stft_pallas_diff_fwd(x, n_fft, hop_length, pad_mode, interpret):
    return _stft_pallas_impl(x, n_fft, hop_length, pad_mode, interpret), x.shape


def _stft_pallas_diff_bwd(n_fft, hop_length, pad_mode, interpret, x_shape, g):
    from flow2gan_tpu.ops.stft import stft

    zero = jnp.zeros(x_shape, jnp.float32)
    _, vjp_fn = jax.vjp(
        lambda a: stft(a, n_fft, hop_length, pad_mode=pad_mode, method="matmul"),
        zero,
    )
    (dx,) = vjp_fn(g)
    return (dx,)


_stft_pallas_diff.defvjp(_stft_pallas_diff_fwd, _stft_pallas_diff_bwd)


def _stft_pallas_impl(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    pad_mode: str = "reflect",
    interpret: bool = False,
) -> jnp.ndarray:
    b, L = x.shape
    # pad the batch to a multiple of 8: keeps the per-block row count at 8
    # (a large ragged batch as one block would blow VMEM / unroll budget)
    b_pad = (-b) % 8
    if b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, 0)))
    bp = b + b_pad
    t_f = num_frames(L, hop_length)
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode=pad_mode)
    k = n_fft // hop_length
    needed = (t_f - 1 + k) * hop_length  # blocks cover every frame slice
    cur = xp.shape[-1]
    if needed > cur:
        xp = jnp.pad(xp, ((0, 0), (0, needed - cur)))
    else:
        xp = xp[:, :needed]
    n_blocks = needed // hop_length
    blocks = xp.reshape(bp, n_blocks, hop_length)

    # window folded into the DFT matrices
    window = hann_window_np(n_fft)
    C, S = _rdft_matrices(n_fft)
    cw = jnp.asarray(window[:, None] * C)
    sw = jnp.asarray(window[:, None] * S)
    f = n_fft // 2 + 1

    r = 8
    kernel = functools.partial(
        _stft_kernel, hop=hop_length, n_fft=n_fft, t_f=t_f
    )
    re, im = pl.pallas_call(
        kernel,
        grid=(bp // r,),
        in_specs=[
            pl.BlockSpec((r, n_blocks, hop_length), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_fft, f), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, f), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((r, t_f, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, t_f, f), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, t_f, f), jnp.float32),
            jax.ShapeDtypeStruct((bp, t_f, f), jnp.float32),
        ),
        interpret=interpret,
    )(blocks, cw, sw)
    return jax.lax.complex(re[:b], im[:b])
