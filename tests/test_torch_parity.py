"""End-to-end numerical parity: reference torch MelAudioGenerator (random
weights) vs our JAX model with weights converted through
`flow2gan_tpu.compat.torch_convert`.

This is the checkpoint-conversion-fidelity oracle: if this holds on random
weights for the real architecture (eval mode, deterministic noise), released
`.pt` checkpoints convert losslessly.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flow2gan_tpu.compat.torch_convert import (
    convert_torch_state_dict,
    strip_prefixes,
)
from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.utils import AttributeDict

from .reference_stubs import import_reference

# a scaled-down config exercising every architectural feature (3 branches,
# cond encoder, time embedding, residual scales)
SMALL_CFG = dict(
    sampling_rate=24000,
    n_mels=16,
    mel_n_fft=256,
    mel_hop_length=64,
    n_ffts=(64, 32),
    hop_lengths=(32, 16),
    # channels[1] == time_embed_channels makes estimators_1.time_embed_proj a
    # SQUARE Linear — regression guard for the converter's always-transpose rule
    channels=(48, 32),
    time_embed_channels=32,
    hidden_factor=3,
    conv_kernel_sizes=(7, 7),
    num_layers=(2, 2),
    use_cond_encoder=True,
    cond_enc_channels=32,
    cond_enc_hidden_factor=3,
    cond_enc_conv_kernel_size=7,
    cond_enc_num_layers=2,
    init_noise_scale=0.1,
    pred_x1=True,
    branch_reduction="mean",
    spec_scaling_loss=True,
    loss_n_filters=32,
    loss_n_fft=256,
    loss_hop_length=64,
    loss_power=0.5,
    loss_eps=1e-7,
    loss_scale_min=1e-2,
    loss_scale_max=1e2,
    branch_dropout=0.05,
    max_add_noise_scale=0.0,
)


@pytest.fixture(scope="module")
def pair(reference_dir):
    flow2gan = import_reference()
    from flow2gan.models.generator import MelAudioGenerator as TorchGen

    torch.manual_seed(0)
    ref_cfg = dict(SMALL_CFG)
    ref_cfg["residual_scale"] = 1.0
    tmodel = TorchGen(**{k: v for k, v in ref_cfg.items() if k != "use_residual_scale"})
    tmodel.eval()

    cfg = AttributeDict({**SMALL_CFG, "use_residual_scale": True})
    jmodel = build_generator(cfg)
    rng = jax.random.PRNGKey(0)
    cond_shape = (2, cfg["n_mels"], 24)
    template = jmodel.init(
        {"params": rng, "noise": rng},
        jnp.zeros(cond_shape),
        n_timesteps=1,
        method="infer",
    )

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    sd = strip_prefixes(sd)
    params, missing, unexpected = convert_torch_state_dict(
        sd, template["params"], strict=True
    )
    assert not missing
    return tmodel, jmodel, {"params": params}, cfg


@pytest.mark.parametrize("n_timesteps", [1, 2, 4])
def test_infer_parity(pair, n_timesteps):
    tmodel, jmodel, variables, cfg = pair
    B, frames = 2, 24
    rng = np.random.RandomState(42)
    cond = rng.randn(B, cfg["n_mels"], frames).astype(np.float32)
    L = frames * cfg["mel_hop_length"]
    noise = (rng.randn(B, L) * cfg["init_noise_scale"]).astype(np.float32)

    with torch.no_grad():
        tcond = tmodel.cond_encoder(torch.from_numpy(cond))
        tout = (
            tmodel.__class__.__mro__[1]
            .infer(
                tmodel,
                noise=torch.from_numpy(noise),
                cond=tcond,
                audio_lens=None,
                n_timesteps=n_timesteps,
                clamp_pred=True,
            )
            .numpy()
        )

    jout = np.asarray(
        jmodel.apply(
            variables,
            jnp.asarray(noise),
            jnp.asarray(cond),
            n_timesteps=n_timesteps,
            clamp_pred=True,
            method="infer_from_noise",
        )
    )
    assert jout.shape == tout.shape
    scale = np.abs(tout).max() + 1e-9
    err = np.abs(jout - tout).max() / scale
    assert err < 1e-4, f"relative infer mismatch {err} at {n_timesteps} steps"


def test_infer_parity_with_lens_mask(pair):
    tmodel, jmodel, variables, cfg = pair
    B, frames = 2, 24
    rng = np.random.RandomState(1)
    cond = rng.randn(B, cfg["n_mels"], frames).astype(np.float32)
    L = frames * cfg["mel_hop_length"]
    noise = (rng.randn(B, L) * 0.1).astype(np.float32)
    lens = np.asarray([L, L - 200], np.int64)

    with torch.no_grad():
        tcond = tmodel.cond_encoder(torch.from_numpy(cond))
        tout = (
            tmodel.__class__.__mro__[1]
            .infer(
                tmodel,
                noise=torch.from_numpy(noise),
                cond=tcond,
                audio_lens=torch.from_numpy(lens),
                n_timesteps=1,
                clamp_pred=False,
            )
            .numpy()
        )
    jout = np.asarray(
        jmodel.apply(
            variables,
            jnp.asarray(noise),
            jnp.asarray(cond),
            audio_lens=jnp.asarray(lens),
            n_timesteps=1,
            method="infer_from_noise",
        )
    )
    scale = np.abs(tout).max() + 1e-9
    err = np.abs(jout - tout).max() / scale
    assert err < 1e-4, f"masked infer mismatch {err}"


def test_loss_parity(pair):
    """FM loss with fixed t/x0: compare compute_loss + process_model numerics."""
    tmodel, jmodel, variables, cfg = pair
    B, frames = 2, 24
    rng = np.random.RandomState(3)
    cond = rng.randn(B, cfg["n_mels"], frames).astype(np.float32)
    L = frames * cfg["mel_hop_length"]
    audio = (0.2 * rng.randn(B, L)).astype(np.float32)
    x0 = (0.1 * rng.randn(B, L)).astype(np.float32)
    t = np.asarray([0.3, 0.7], np.float32)
    lens = np.asarray([L, L - 100], np.int64)

    with torch.no_grad():
        tcond = tmodel.cond_encoder(torch.from_numpy(cond))
        x = (1 - torch.from_numpy(t)[:, None]) * torch.from_numpy(x0) + torch.from_numpy(
            t
        )[:, None] * torch.from_numpy(audio)
        tpred = tmodel.process_model(
            x=x,
            cond=tcond,
            t=torch.from_numpy(t),
            audio_lens=torch.from_numpy(lens),
        )
        tloss = tmodel.compute_loss(
            pred=tpred,
            ref=torch.from_numpy(audio),
            audio_lens=torch.from_numpy(lens),
            gt_audio=torch.from_numpy(audio),
        ).item()

    def j_loss(variables, cond, audio, x0, t, lens):
        def inner(mdl):
            c = mdl._encode_cond(cond, train=False)
            x = (1 - t[:, None]) * x0 + t[:, None] * audio
            pred = mdl.process_model(x=x, cond=c, t=t, audio_lens=lens, train=False)
            return mdl.compute_loss(
                pred=pred, ref=audio, audio_lens=lens, gt_audio=audio
            )

        return jmodel.apply(variables, method=inner)

    jloss = float(
        j_loss(
            variables,
            jnp.asarray(cond),
            jnp.asarray(audio),
            jnp.asarray(x0),
            jnp.asarray(t),
            jnp.asarray(lens),
        )
    )
    assert abs(jloss - tloss) / (abs(tloss) + 1e-9) < 1e-3, (jloss, tloss)


def test_gan_checkpoint_unwrap_and_convert(pair, tmp_path):
    """Loading a torch GAN checkpoint (generator.* + discriminator.* keys)
    through strip_prefixes(unwrap_generator=True) + converter must equal the
    direct generator conversion — the bin/infer --load-gan path."""
    import torch

    tmodel, jmodel, variables, cfg = pair
    sd_gen = {f"generator.{k}": v for k, v in tmodel.state_dict().items()}
    # fake discriminator/mel-recon entries that must be ignored
    sd_gen["discriminator.0.discriminators.0.convs.0.weight"] = torch.zeros(32, 1, 5, 1)
    sd_gen["mel_recon_modules.0.mel.spectrogram.window"] = torch.zeros(32)

    stripped = strip_prefixes(
        {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd_gen.items()},
        unwrap_generator=True,
    )
    # unwrap must DROP non-generator entries entirely
    assert not any("discriminator" in k or "mel_recon" in k for k in stripped)
    params, missing, unexpected = convert_torch_state_dict(
        stripped, variables["params"], strict=True
    )
    assert not missing
    assert not unexpected
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
