"""HiFi-GAN Multi-Period and DAC-style Multi-Resolution discriminators.

TPU-native (NHWC) re-design of /root/reference/flow2gan/models/discriminators.py.
weight_norm is deliberately absent, like the reference (ScaledAdam makes it
unnecessary; discriminators.py:13-15). Channel layouts are chosen so a torch
GAN checkpoint converts through flow2gan_tpu.compat.torch_convert.

Score/feature-map semantics match the reference exactly:
- DiscriminatorP: reflect-pad time to a multiple of `period`, fold to a 2-D
  (time/period, period) map, five (5,1)-kernel convs with stride (3,1) then
  (1,1), leaky_relu(0.1); fmaps from convs 1..4 and conv_post.
- DiscriminatorR: DC-removal + 0.8 peak normalization, complex STFT split
  into 5 frequency bands, per-band (3,9) conv stacks, concat on the frequency
  axis, (3,3) conv_post.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from flow2gan_tpu.ops.stft import stft as _stft


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    num_embeddings: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cond_embedding_id: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: (B, T) -> (B, T/p, p, 1) NHWC
        b, t = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, 1)

        k = self.kernel_size
        pad = ((k // 2, k // 2), (0, 0))
        fmap = []
        channels = [32, 128, 512, 1024, 1024]
        strides = [(self.stride, 1)] * 4 + [(1, 1)]
        for i, (ch, st) in enumerate(zip(channels, strides)):
            x = nn.Conv(ch, (k, 1), strides=st, padding=pad, name=f"convs_{i}")(x)
            x = _leaky(x)
            if i > 0:
                fmap.append(x)
        if self.num_embeddings is not None and cond_embedding_id is not None:
            emb = nn.Embed(
                self.num_embeddings,
                1024,
                embedding_init=nn.initializers.zeros,
                name="emb",
            )(cond_embedding_id)
            h = jnp.sum(emb[:, None, None, :] * x, axis=-1, keepdims=True)
        else:
            h = 0.0
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        fmap.append(x)
        x = x + h
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Reference discriminators.py:18-48."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    num_embeddings: Optional[int] = None

    def setup(self):
        self.discriminators = [
            DiscriminatorP(
                period=p, num_embeddings=self.num_embeddings, name=f"discriminators_{i}"
            )
            for i, p in enumerate(self.periods)
        ]

    def __call__(self, y, y_hat, bandwidth_id=None):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in self.discriminators:
            y_d_r, fmap_r = d(y, cond_embedding_id=bandwidth_id)
            y_d_g, fmap_g = d(y_hat, cond_embedding_id=bandwidth_id)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorR(nn.Module):
    window_length: int
    channels: int = 32
    hop_factor: float = 0.25
    bands: Tuple[Tuple[float, float], ...] = (
        (0.0, 0.1),
        (0.1, 0.25),
        (0.25, 0.5),
        (0.5, 0.75),
        (0.75, 1.0),
    )
    num_embeddings: Optional[int] = None

    def _spectrogram(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # DC removal + peak normalization (reference discriminators.py:186-196)
        x = x - x.mean(axis=-1, keepdims=True)
        x = 0.8 * x / (jnp.abs(x).max(axis=-1, keepdims=True) + 1e-9)
        spec = _stft(
            x, self.window_length, int(self.window_length * self.hop_factor)
        )  # (B, T, F) complex
        z = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, T, F, 2) NHWC
        n_fft = self.window_length // 2 + 1
        bands = [(int(b0 * n_fft), int(b1 * n_fft)) for b0, b1 in self.bands]
        return [z[:, :, b0:b1, :] for b0, b1 in bands]

    @nn.compact
    def __call__(self, x, cond_embedding_id=None):
        x_bands = self._spectrogram(x)
        fmap = []
        outs = []
        ch = self.channels
        for bi, band in enumerate(x_bands):
            specs = [
                dict(features=ch, kernel_size=(3, 9), strides=(1, 1), padding=((1, 1), (4, 4))),
                dict(features=ch, kernel_size=(3, 9), strides=(1, 2), padding=((1, 1), (4, 4))),
                dict(features=ch, kernel_size=(3, 9), strides=(1, 2), padding=((1, 1), (4, 4))),
                dict(features=ch, kernel_size=(3, 9), strides=(1, 2), padding=((1, 1), (4, 4))),
                dict(features=ch, kernel_size=(3, 3), strides=(1, 1), padding=((1, 1), (1, 1))),
            ]
            for i, sp in enumerate(specs):
                band = nn.Conv(name=f"band_convs_{bi}_{i}", **sp)(band)
                band = _leaky(band)
                if i > 0:
                    fmap.append(band)
            outs.append(band)
        x = jnp.concatenate(outs, axis=2)  # concat on freq axis
        if self.num_embeddings is not None and cond_embedding_id is not None:
            emb = nn.Embed(
                self.num_embeddings,
                ch,
                embedding_init=nn.initializers.zeros,
                name="emb",
            )(cond_embedding_id)
            h = jnp.sum(emb[:, None, None, :] * x, axis=-1, keepdims=True)
        else:
            h = 0.0
        x = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="conv_post")(x)
        fmap.append(x)
        x = x + h
        return x, fmap


class MultiResolutionDiscriminator(nn.Module):
    """Reference discriminators.py:110-147."""

    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)
    num_embeddings: Optional[int] = None

    def setup(self):
        self.discriminators = [
            DiscriminatorR(
                window_length=w,
                num_embeddings=self.num_embeddings,
                name=f"discriminators_{i}",
            )
            for i, w in enumerate(self.fft_sizes)
        ]

    def __call__(self, y, y_hat, bandwidth_id=None):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in self.discriminators:
            y_d_r, fmap_r = d(y, cond_embedding_id=bandwidth_id)
            y_d_g, fmap_g = d(y_hat, cond_embedding_id=bandwidth_id)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class Discriminators(nn.Module):
    """MPD + MRD bundle; param tree keys 'discriminator_0'/'discriminator_1'
    mirror the reference GAN's ModuleList (gan.py:40-42) for conversion.

    `periods`/`fft_sizes` default to the reference values; smaller tuples are
    used by the multi-chip dryrun / tests to keep compile time down."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)

    def setup(self):
        self.mpd = MultiPeriodDiscriminator(
            periods=self.periods, name="discriminator_0"
        )
        self.mrd = MultiResolutionDiscriminator(
            fft_sizes=self.fft_sizes, name="discriminator_1"
        )

    def __call__(self, y, y_hat):
        mp = self.mpd(y, y_hat)
        mr = self.mrd(y, y_hat)
        return mp, mr
