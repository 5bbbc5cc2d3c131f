"""Pallas fused STFT kernel vs the XLA matmul-DFT path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from flow2gan_tpu.ops.pallas_stft import stft_pallas, supported
from flow2gan_tpu.ops.stft import stft


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (256, 128), (1024, 256)])
@pytest.mark.parametrize("batch", [3, 8])
def test_pallas_stft_matches_xla(n_fft, hop, batch):
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 9000).astype(np.float32)
    )
    ref = np.asarray(stft(x, n_fft, hop, method="matmul"))
    out = np.asarray(stft_pallas(x, n_fft, hop, interpret=True))
    assert out.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-6


def test_pallas_stft_unsupported_hop():
    assert not supported(128, 64)
    x = jnp.zeros((2, 4000), jnp.float32)
    with pytest.raises(NotImplementedError):
        stft_pallas(x, 128, 64, interpret=True)


def test_pallas_stft_differentiable():
    import jax

    x = jnp.asarray(np.random.RandomState(3).randn(2, 4000).astype(np.float32))
    g_pallas = jax.grad(
        lambda a: jnp.abs(stft_pallas(a, 256, 128, interpret=True)).sum()
    )(x)
    g_xla = jax.grad(
        lambda a: jnp.abs(stft(a, 256, 128, method="matmul")).sum()
    )(x)
    scale = np.abs(np.asarray(g_xla)).max() + 1e-9
    assert np.abs(np.asarray(g_pallas - g_xla)).max() / scale < 1e-5
