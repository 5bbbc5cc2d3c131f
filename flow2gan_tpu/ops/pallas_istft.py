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

The grid tiles BOTH batch and time: a (r, tb, f) spectrogram tile produces a
(tb + k - 1, hop)-frame overlap-add contribution, and the k-1-frame halos
between adjacent time tiles are summed outside the kernel with two shifted
adds (elementwise on audio-sized data; XLA fuses them into the trim/envelope
epilogue). Time tiling keeps per-block VMEM bounded (~8 MB) regardless of
audio length — a 60 s whole-file synthesis (t_f ≈ 5.6k frames) previously
requested 121 MB blocks and failed Mosaic's 16 MB scoped-VMEM check.

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
    tb = re_ref.shape[1]  # frames in this time tile
    k = n_fft // hop
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
            fj = frames[:, j * hop : (j + 1) * hop]  # (tb, hop)
            shifted = jnp.pad(fj, ((j, k - 1 - j), (0, 0)))  # (tb+k-1, hop)
            acc = shifted if acc is None else acc + shifted
        out_ref[i, 0] = acc


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


# Target for the kernel's scoped-VMEM footprint. The hardware limit is 16 MiB
# (XLA:TPU's default --xla_tpu_scoped_vmem_limit_kib); 12 MiB leaves margin
# for allocator overheads the model below doesn't see (semaphores, the full
# S(1)-placed result XLA sometimes stacks alongside the block buffers).
_VMEM_BUDGET = 12 * 1024 * 1024
_VMEM_LIMIT = 15 * 1024 * 1024


def _block_vmem_bytes(tb: int, f: int, n_fft: int, hop: int, r: int) -> int:
    """Scoped-VMEM bytes Mosaic allocates for one grid step at time tile tb.

    Model (validated against two real compiler failures on v5e, round 5):
      - re/im input blocks (r, tb, f) are DOUBLE-buffered for the pipeline,
        and the lane dim f is padded to a multiple of 128 (257 -> 384: +49%
        over the naive estimate — the round-4 hole);
      - the output block (r, tb+k-1, hop) is double-buffered, sublane padded
        to a multiple of 8 (hop is already 128-aligned per `supported`);
      - the two iDFT matrices (f, n_fft) are resident once, sublane padded.
    Measured: b=8, t_f=528, n_fft=512, hop=256 -> tb=264 gives 16.62 MiB and
    tb=256 gives 16.12 MiB (both compile failures at the 16 MiB limit); this
    model reproduces both figures exactly (17,432,576 / 16,908,288 bytes for
    the in+out block terms).
    """
    k = n_fft // hop
    inp = 2 * 2 * r * tb * _pad128(f) * 4
    out = 2 * r * _pad8(tb + k - 1) * hop * 4
    mats = 2 * _pad8(f) * n_fft * 4
    return inp + out + mats


def _pick_time_block(t_f: int, f: int, n_fft: int, hop: int,
                     r: int) -> Optional[int]:
    """Largest multiple-of-8 time tile whose scoped-VMEM footprint fits.

    Targets `_VMEM_BUDGET`; returns the smallest legal tile instead if that
    still fits under the hard `_VMEM_LIMIT`, and None when even the smallest
    tile cannot compile (callers fall back to the XLA iSTFT — the "auto"
    switch must never produce an uncompilable program).
    """
    # the halo stitch needs tb >= k-1 (a tile must cover its own overlap)
    k = n_fft // hop
    tb_min = max(8, _pad8(k - 1))
    tb = max(min(_pad8(t_f), 512), tb_min)
    while tb > tb_min and _block_vmem_bytes(tb, f, n_fft, hop, r) > _VMEM_BUDGET:
        tb -= 8
    if _block_vmem_bytes(tb, f, n_fft, hop, r) > _VMEM_LIMIT:
        return None
    return tb


def fits_vmem(batch: int, t_f: int, n_fft: int, hop_length: int) -> bool:
    """True when some time tile keeps the kernel inside scoped VMEM.

    Trace-time predicate (all static shapes); `istft_pallas` also checks this
    itself and silently falls back to the XLA iSTFT when it fails.
    """
    if not supported(n_fft, hop_length):
        return False
    f = n_fft // 2 + 1
    r = 8 if batch >= 8 else batch
    return _pick_time_block(t_f, f, n_fft, hop_length, r) is not None


def istft_pallas(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    length: Optional[int] = None,
    interpret: bool = False,
    time_block: Optional[int] = None,
) -> jnp.ndarray:
    """Fused iSTFT of complex (B, T_f, F) -> (B, length).

    Semantics match ops.stft.istft (center=True, periodic Hann). Requires
    `supported(n_fft, hop_length)`; callers should fall back to ops.stft.istft
    otherwise. Differentiable: iSTFT is linear, so the VJP reuses the XLA
    path's adjoint (Pallas kernels have no autodiff rule of their own) —
    training configs may therefore enable use_pallas_istft too.

    `time_block` overrides the auto-chosen time-tile size (tests use a tiny
    tile to exercise the multi-tile halo path on short audio).
    """
    if not supported(n_fft, hop_length):
        raise NotImplementedError(
            f"istft_pallas requires 128-aligned hop (got n_fft={n_fft}, "
            f"hop={hop_length}); use ops.stft.istft"
        )
    return _istft_pallas_diff(
        spec, n_fft, hop_length, length, interpret, time_block
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _istft_pallas_diff(spec, n_fft, hop_length, length, interpret, time_block):
    return _istft_pallas_impl(
        spec, n_fft, hop_length, length, interpret, time_block
    )


def _istft_pallas_diff_fwd(spec, n_fft, hop_length, length, interpret,
                           time_block):
    out = _istft_pallas_impl(
        spec, n_fft, hop_length, length, interpret, time_block
    )
    return out, spec.shape


def _istft_pallas_diff_bwd(n_fft, hop_length, length, interpret, time_block,
                           spec_shape, g):
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
    time_block: Optional[int] = None,
) -> jnp.ndarray:
    b, t_f, f = spec.shape
    assert f == n_fft // 2 + 1, (f, n_fft)
    k = n_fft // hop_length
    default_len = (t_f - 1) * hop_length
    out_len = default_len if length is None else min(length, default_len)

    # batch blocking: r=8 rows per block when the batch is large; a small
    # batch (whole-file inference is b=1) gets r=b so no padded rows are
    # synthesized (the batch dim is not a Mosaic-tiled dim, any size works)
    r = 8 if b >= 8 else b
    b_pad = (-b) % r
    if b_pad:
        spec = jnp.pad(spec, ((0, b_pad), (0, 0), (0, 0)))
    bp = b + b_pad

    # time tiling: bound per-block VMEM independent of audio length
    tb = time_block or _pick_time_block(t_f, f, n_fft, hop_length, r)
    if tb is None:
        # no tile size fits scoped VMEM (round-4 class of on-chip compile
        # crashes): fall back to the XLA iSTFT, identical numerics
        from flow2gan_tpu.ops.stft import istft

        if b_pad:
            spec = spec[:b]
        return istft(spec, n_fft, hop_length, length=length, method="matmul")
    if tb < k - 1:
        raise ValueError(
            f"time_block={tb} must be >= k-1={k - 1} (a tile must cover its "
            f"own overlap-add halo; n_fft={n_fft}, hop={hop_length})"
        )
    n_t = -(-t_f // tb)
    t_pad = n_t * tb - t_f
    if t_pad:  # zero spec frames contribute zero to the overlap-add
        spec = jnp.pad(spec, ((0, 0), (0, t_pad), (0, 0)))

    window = hann_window_np(n_fft)
    A, B = _irdft_matrices(n_fft)
    aw = jnp.asarray(A * window[None, :])
    bw = jnp.asarray(B * window[None, :])

    kernel = functools.partial(_istft_kernel, hop=hop_length, n_fft=n_fft)
    tiles = pl.pallas_call(
        kernel,
        grid=(bp // r, n_t),
        in_specs=[
            pl.BlockSpec((r, tb, f), lambda i, j: (i, j, 0)),
            pl.BlockSpec((r, tb, f), lambda i, j: (i, j, 0)),
            pl.BlockSpec((f, n_fft), lambda i, j: (0, 0)),
            pl.BlockSpec((f, n_fft), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (r, 1, tb + k - 1, hop_length), lambda i, j: (i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bp, n_t, tb + k - 1, hop_length), jnp.float32
        ),
        interpret=interpret,
    )(spec.real, spec.imag, aw, bw)

    # stitch the tiles: tile j owns output frames [j*tb, j*tb + tb + k - 1);
    # the k-1-frame halo overlaps the head of tile j+1 and is summed here
    t_full = n_t * tb + k - 1
    body = tiles[:, :, :tb, :].reshape(bp, n_t * tb, hop_length)
    full = jnp.pad(body, ((0, 0), (0, k - 1), (0, 0)))
    if k > 1:
        tail = tiles[:, :, tb:, :]  # (bp, n_t, k-1, hop)
        tail = jnp.pad(
            tail, ((0, 0), (0, 0), (0, tb - (k - 1)), (0, 0))
        ).reshape(bp, n_t * tb, hop_length)
        shifted = jnp.pad(tail, ((0, 0), (tb, 0), (0, 0)))[:, :t_full, :]
        full = full + shifted

    start = n_fft // 2
    flat = full[:b].reshape(b, t_full * hop_length)
    y = jax.lax.slice_in_dim(flat, start, start + out_len, axis=1)
    inv_env = jnp.asarray(1.0 / _istft_envelope(t_f, n_fft, hop_length)[:out_len])
    y = y * inv_env[None, :]
    if length is not None and length > out_len:
        y = jnp.pad(y, ((0, 0), (0, length - out_len)))
    return y
