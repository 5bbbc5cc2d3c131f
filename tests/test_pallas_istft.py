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
