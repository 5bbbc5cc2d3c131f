"""Golden parity tests: flow2gan_tpu.ops.stft vs torch.stft/torch.istft.

These pin the DSP core to the exact numerics the reference model was trained
with (reference modules.py:52-116 wraps torch.stft/istft with center=True,
periodic Hann, onesided).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from flow2gan_tpu.ops import stft as stft_ops

CONFIGS = [
    (512, 256),
    (256, 128),
    (128, 64),
    (1024, 256),
    (2048, 512),
]


def _rand(b, l, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, l).astype(np.float32) * 0.3


@pytest.mark.parametrize("n_fft,hop", CONFIGS)
def test_hann_window_matches_torch(n_fft, hop):
    ours = np.asarray(stft_ops.hann_window(n_fft))
    theirs = torch.hann_window(n_fft).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop", CONFIGS)
@pytest.mark.parametrize("length", [24000, 12001, 36137])
def test_stft_matches_torch(n_fft, hop, length):
    x = _rand(2, length)
    ours = np.asarray(stft_ops.stft(jnp.asarray(x), n_fft, hop))  # (B, T, F)
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        return_complex=True,
        onesided=True,
    ).numpy()  # (B, F, T)
    theirs = np.swapaxes(theirs, 1, 2)
    assert ours.shape == theirs.shape
    assert ours.shape[1] == 1 + length // hop
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=2e-4 * scale)


@pytest.mark.parametrize("n_fft,hop", CONFIGS)
def test_istft_matches_torch(n_fft, hop):
    length = 24000
    x = _rand(2, length, seed=1)
    spec_t = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        return_complex=True,
        onesided=True,
    )
    # perturb so we aren't just inverting a perfectly consistent STFT
    g = torch.Generator().manual_seed(0)
    spec_t = spec_t + 0.05 * torch.complex(
        torch.randn(spec_t.shape, generator=g), torch.randn(spec_t.shape, generator=g)
    )
    theirs = torch.istft(
        spec_t,
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        onesided=True,
    ).numpy()
    spec_j = jnp.asarray(np.swapaxes(spec_t.numpy(), 1, 2))
    ours = np.asarray(stft_ops.istft(spec_j, n_fft, hop))
    assert ours.shape == theirs.shape
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=3e-4 * scale)


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (128, 64)])
def test_stft_istft_roundtrip(n_fft, hop):
    length = 12000
    x = _rand(1, length, seed=2)
    spec = stft_ops.stft(jnp.asarray(x), n_fft, hop)
    y = np.asarray(stft_ops.istft(spec, n_fft, hop, length=length))
    # interior must reconstruct nearly exactly (COLA); edges are window-tapered
    np.testing.assert_allclose(
        y[:, n_fft : length - n_fft], x[:, n_fft : length - n_fft], atol=1e-4
    )


def test_spec_real_pack_roundtrip_matches_reference_layout():
    # channel order must be [Re(f0..fF) | Im(f0..fF)] (reference fft_to_real,
    # modules.py:31-38, after the (B, C, T) -> (B, T, C) transpose)
    x = _rand(1, 4096, seed=3)
    spec = stft_ops.stft(jnp.asarray(x), 128, 64)  # (B, T, 65)
    packed = stft_ops.spec_to_real(spec)
    assert packed.shape[-1] == 130
    np.testing.assert_allclose(np.asarray(packed[..., :65]), np.asarray(spec.real))
    np.testing.assert_allclose(np.asarray(packed[..., 65:]), np.asarray(spec.imag))
    back = stft_ops.real_to_spec(packed)
    np.testing.assert_allclose(np.asarray(back), np.asarray(spec))


def test_stft_lens():
    lens = jnp.asarray([24000, 12000, 6001])
    np.testing.assert_array_equal(
        np.asarray(stft_ops.stft_lens(lens, 256)), [94, 47, 24]
    )


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (128, 64), (1024, 256)])
def test_matmul_dft_matches_fft(n_fft, hop):
    """The MXU matmul-DFT backend must match the FFT backend bit-closely."""
    x = _rand(2, 12000, seed=9)
    a = np.asarray(stft_ops.stft(jnp.asarray(x), n_fft, hop, method="fft"))
    b = np.asarray(stft_ops.stft(jnp.asarray(x), n_fft, hop, method="matmul"))
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=3e-5 * scale)

    spec = stft_ops.stft(jnp.asarray(x), n_fft, hop)
    ya = np.asarray(stft_ops.istft(spec, n_fft, hop, method="fft"))
    yb = np.asarray(stft_ops.istft(spec, n_fft, hop, method="matmul"))
    np.testing.assert_allclose(yb, ya, atol=3e-5 * (np.abs(ya).max() + 1e-9))
