"""GAN fine-tuning losses (stage 2).

Pure-function re-design of /root/reference/flow2gan/models/gan.py: the torch
GAN nn.Module's forward(train_disc=...) becomes two loss functions usable
inside jitted D/G steps (training/gan_step.py). Hinge losses, L1 feature
matching (real fmaps detached, gan.py:86), and the multi-scale log-mel L1
reconstruction loss (gan.py:89-99).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from flow2gan_tpu.ops.mel import MelSpectrogram
from flow2gan_tpu.utils import safe_log


def discriminator_loss(score_real: List, score_fake: List) -> jnp.ndarray:
    """Hinge D loss (reference gan.py:57-66)."""
    loss = 0.0
    for s_real, s_fake in zip(score_real, score_fake):
        loss = loss + jnp.mean(jnp.maximum(1.0 - s_real, 0.0))
        loss = loss + jnp.mean(jnp.maximum(1.0 + s_fake, 0.0))
    return loss


def generator_loss(score_fake: List) -> jnp.ndarray:
    """Hinge G loss (reference gan.py:68-75)."""
    loss = 0.0
    for s_fake in score_fake:
        loss = loss + jnp.mean(jnp.maximum(1.0 - s_fake, 0.0))
    return loss


def feature_matching_loss(fmap_real: List[List], fmap_fake: List[List]) -> jnp.ndarray:
    """L1 over all feature maps; real side detached (reference gan.py:77-87)."""
    loss = 0.0
    for f_real, f_fake in zip(fmap_real, fmap_fake):
        for r, f in zip(f_real, f_fake):
            loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - f))
    return loss


def make_mel_recon_fns(
    sampling_rate: int,
    mel_recon_n_ffts: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
    mel_recon_n_mels: Sequence[int] = (5, 10, 20, 40, 80, 160, 320),
) -> Tuple[MelSpectrogram, ...]:
    """The K mel frontends of the multi-scale recon loss (reference
    gan.py:44-55: hop = n_fft // 4, power=1, center=True)."""
    return tuple(
        MelSpectrogram(
            sampling_rate=sampling_rate,
            n_fft=n_fft,
            hop_length=n_fft // 4,
            n_mels=n_mels,
            power=1.0,
        )
        for n_fft, n_mels in zip(mel_recon_n_ffts, mel_recon_n_mels)
    )


def mel_recon_loss(real: jnp.ndarray, fake: jnp.ndarray, mel_fns) -> jnp.ndarray:
    """Multi-scale log-mel L1 (reference gan.py:89-99)."""
    loss = 0.0
    for fn in mel_fns:
        real_mel = safe_log(fn(real))
        fake_mel = safe_log(fn(fake))
        loss = loss + jnp.mean(jnp.abs(real_mel - fake_mel))
    return loss
