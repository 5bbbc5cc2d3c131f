"""Pallas fused iSTFT kernel vs the XLA reference implementation
(interpret mode on CPU; compiled path exercised on TPU by benchmarks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from flow2gan_tpu.ops.pallas_istft import istft_pallas
from flow2gan_tpu.ops.stft import istft, stft


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (256, 128), (1024, 256)])
@pytest.mark.parametrize("batch", [3, 8, 16])
def test_pallas_istft_matches_xla(n_fft, hop, batch):
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 8000).astype(np.float32)
    )
    spec = stft(x, n_fft, hop)
    ref = np.asarray(istft(spec, n_fft, hop, method="matmul"))
    out = np.asarray(istft_pallas(spec, n_fft, hop, interpret=True))
    assert out.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-6


def test_pallas_istft_length_pad():
    x = jnp.asarray(np.random.RandomState(1).randn(8, 4000).astype(np.float32))
    spec = stft(x, 256, 128)
    out = np.asarray(istft_pallas(spec, 256, 128, length=4100, interpret=True))
    assert out.shape == (8, 4100)
    np.testing.assert_array_equal(out[:, -100:], 0.0)  # zero-padded tail


def test_pallas_istft_unsupported_hop_raises():
    from flow2gan_tpu.ops.pallas_istft import supported

    assert not supported(128, 64)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4000).astype(np.float32))
    spec = stft(x, 128, 64)
    with pytest.raises(NotImplementedError):
        istft_pallas(spec, 128, 64, interpret=True)


def test_pallas_istft_differentiable():
    """VJP via the XLA adjoint (iSTFT is linear): grads must match the XLA
    path, enabling use_pallas_istft in training configs."""
    import jax

    x = jnp.asarray(np.random.RandomState(2).randn(2, 4000).astype(np.float32))
    spec = stft(x, 256, 128)
    g_pallas = jax.grad(
        lambda s: (istft_pallas(s, 256, 128, 4000, True) ** 2).sum()
    )(spec)
    g_xla = jax.grad(
        lambda s: (istft(s, 256, 128, length=4000, method="matmul") ** 2).sum()
    )(spec)
    scale = np.abs(np.asarray(g_xla)).max() + 1e-9
    assert np.abs(np.asarray(g_pallas - g_xla)).max() / scale < 1e-5


def test_pallas_istft_disabled_context():
    """The trace-time disable flag (used while tracing scanned rollouts,
    where the custom call's buffers would be stack-allocated in scoped VMEM)
    nests and resets."""
    from flow2gan_tpu.ops import pallas_istft

    assert not pallas_istft.is_disabled()
    with pallas_istft.disabled():
        assert pallas_istft.is_disabled()
        with pallas_istft.disabled():
            assert pallas_istft.is_disabled()
        assert pallas_istft.is_disabled()
    assert not pallas_istft.is_disabled()


def test_scanned_solve_traces_without_pallas_istft():
    """At 44.1 kHz-like shapes the Pallas iSTFT inside the scanned Euler
    rollout OOMs the TPU compiler's 16 MB scoped VMEM (operands/results of a
    tpu_custom_call inside a while body are stack-allocated); the scan branch
    of BaseAudioGenerator.solve must therefore trace the XLA iSTFT even when
    use_pallas_istft is force-enabled, while the unrolled branch keeps the
    kernel."""
    import jax

    from flow2gan_tpu.models import build_generator
    from flow2gan_tpu.models.config import get_generator_config

    cfg = get_generator_config("mel_24k_tiny")
    cfg["n_ffts"] = (256, 128)
    cfg["hop_lengths"] = (128, 128)
    cfg["mel_n_fft"] = 512
    cfg["mel_hop_length"] = 128
    cfg["use_pallas_istft"] = True
    model = build_generator(cfg)
    B, L = 2, 4096
    frames = L // cfg["mel_hop_length"]
    rng = jax.random.PRNGKey(0)
    cond = jax.random.normal(rng, (B, cfg["n_mels"], frames))
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, L))
    # init must run eagerly on CPU where the compiled kernel can't lower;
    # the disable context covers that too (params are flag-independent)
    from flow2gan_tpu.ops import pallas_istft

    with pallas_istft.disabled():
        params = model.init(
            {"params": rng, "noise": rng, "gate": rng, "dropout": rng},
            cond, noise, jnp.asarray([L, L]), train=True,
        )

    def run(scan):
        return str(jax.make_jaxpr(
            lambda p, n, c: model.apply(
                p, n, c, n_timesteps=2, method="infer_from_noise",
                scan_solve=scan)
        )(params, noise, cond))

    assert "tpu_custom_call" in run(False) or "pallas_call" in run(False)
    scanned = run(True)
    assert "tpu_custom_call" not in scanned and "pallas_call" not in scanned


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (1024, 256)])
@pytest.mark.parametrize("batch", [1, 3])
def test_pallas_istft_time_tiled(n_fft, hop, batch):
    """Multi-tile time blocking (the long-audio path): a tiny forced tile
    size exercises tile-boundary halo summation and t_f padding on short
    audio; must be bit-comparable to the single-tile/XLA answer."""
    x = jnp.asarray(
        np.random.RandomState(3).randn(batch, 20000).astype(np.float32)
    )
    spec = stft(x, n_fft, hop)  # t_f = 79 -> 5 tiles of 16 (pad 1)
    ref = np.asarray(istft(spec, n_fft, hop, method="matmul"))
    out = np.asarray(istft_pallas(spec, n_fft, hop, interpret=True,
                                  time_block=16))
    assert out.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-6


def test_pick_time_block_bounds_vmem():
    """60 s @ 24 kHz whole-file shapes must pick a tile far below t_f (the
    untiled kernel requested ~121 MB blocks vs Mosaic's 16 MB scoped VMEM)."""
    from flow2gan_tpu.ops.pallas_istft import _pick_time_block

    tb = _pick_time_block(t_f=5627, f=257, n_fft=512, hop=256, r=8)
    assert tb % 8 == 0
    assert 8 <= tb <= 512
    per_block = 4 * (2 * 8 * tb * 257 + 8 * (tb + 1) * 256)
    assert per_block < 12 * 1024 * 1024
    # short audio at small batch (whole-file b=1 -> r=1) stays single-tile
    assert _pick_time_block(t_f=282, f=257, n_fft=512, hop=256, r=1) >= 282


def test_vmem_model_reproduces_round4_compile_failures():
    """The scoped-VMEM model must reproduce the two REAL v5e compiler
    failures from the round-4 held-out drive to the KiB (drive log:
    'Scoped allocation with size 16.62M/16.12M ... limit 16.00M'), so any
    future drift in the model is caught before it burns chip time.

    The measured total is the double-buffered re/im input blocks plus the
    double-buffered output block (lane dim 257 padded to 384); the resident
    iDFT matrices are accounted separately by the compiler, so they are
    subtracted from _block_vmem_bytes here.
    """
    from flow2gan_tpu.ops.pallas_istft import _block_vmem_bytes

    mats = 2 * 264 * 512 * 4
    assert _block_vmem_bytes(264, 257, 512, 256, 8) - mats == 17_432_576
    assert _block_vmem_bytes(256, 257, 512, 256, 8) - mats == 16_908_288


def test_pick_time_block_never_exceeds_limit():
    """Every auto-picked tile must fit the hard scoped-VMEM limit across the
    whole shape class the models produce (batch x duration x fft branch);
    round 4 shipped an all-NaN artifact because b=8, t_f=528, n_fft=512
    compiled a 16.62 MiB block. None may exceed _VMEM_LIMIT; infeasible
    shapes must return None (-> XLA fallback), never an uncompilable tile."""
    from flow2gan_tpu.ops.pallas_istft import (
        _VMEM_LIMIT, _block_vmem_bytes, _pick_time_block, fits_vmem,
    )

    for n_fft, hop in [(1024, 512), (512, 256), (256, 128)]:
        f = n_fft // 2 + 1
        for b in [1, 2, 8, 16, 32]:
            r = 8 if b >= 8 else b
            for t_f in [9, 94, 191, 528, 1036, 5627]:
                tb = _pick_time_block(t_f, f, n_fft, hop, r)
                assert tb is not None, (n_fft, hop, b, t_f)
                assert tb % 8 == 0 and tb >= n_fft // hop - 1
                assert _block_vmem_bytes(tb, f, n_fft, hop, r) <= _VMEM_LIMIT
                assert fits_vmem(b, t_f, n_fft, hop)
    # the exact round-4 failing shape must now pick a compilable tile
    tb = _pick_time_block(528, 257, 512, 256, 8)
    assert tb is not None and tb < 256  # 256 was measured uncompilable


def test_istft_pallas_falls_back_when_vmem_infeasible(monkeypatch):
    """When no tile fits, istft_pallas must return the XLA answer instead of
    tracing an uncompilable kernel (the 'auto' switch can never crash)."""
    import flow2gan_tpu.ops.pallas_istft as pi

    monkeypatch.setattr(pi, "_pick_time_block", lambda *a, **k: None)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 8192).astype(np.float32))
    spec = stft(x, 512, 256)
    ref = np.asarray(istft(spec, 512, 256, method="matmul"))
    out = np.asarray(pi.istft_pallas(spec, 512, 256))
    np.testing.assert_allclose(out, ref, atol=1e-6)
