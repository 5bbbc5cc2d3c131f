"""Parity tests: flax MPD/MRD vs the reference torch discriminators with
converted weights, plus GAN loss / step smoke tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flow2gan_tpu.compat.torch_convert import convert_torch_state_dict
from flow2gan_tpu.data.audio_io import read_wav
from flow2gan_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from flow2gan_tpu.models.gan import (
    discriminator_loss,
    feature_matching_loss,
    generator_loss,
    make_mel_recon_fns,
    mel_recon_loss,
)

from .reference_stubs import import_reference


@pytest.fixture(scope="module")
def audio_pair(reference_dir):
    a, sr = read_wav(reference_dir / "test_data" / "wav" / "1089_134686_000002_000000.wav")
    real = a[:, :16384]
    rng = np.random.RandomState(0)
    fake = (real + 0.05 * rng.randn(*real.shape)).astype(np.float32)
    return real, fake


def _convert(tmodel, jmodel, example_args):
    rng = jax.random.PRNGKey(0)
    template = jmodel.init(rng, *example_args)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, missing, unexpected = convert_torch_state_dict(
        sd, template["params"], strict=True
    )
    assert not missing, missing
    return {"params": params}


def test_mpd_parity(reference_dir, audio_pair):
    import_reference()
    from flow2gan.models.discriminators import (
        MultiPeriodDiscriminator as TorchMPD,
    )

    real, fake = audio_pair
    torch.manual_seed(0)
    tmpd = TorchMPD()
    tmpd.eval()
    jmpd = MultiPeriodDiscriminator()
    variables = _convert(tmpd, jmpd, (jnp.asarray(real), jnp.asarray(fake)))

    with torch.no_grad():
        t_out = tmpd(torch.from_numpy(real), torch.from_numpy(fake))
    j_out = jmpd.apply(variables, jnp.asarray(real), jnp.asarray(fake))

    for li in range(len(t_out[0])):  # scores real
        ours, theirs = np.asarray(j_out[0][li]), t_out[0][li].numpy()
        assert ours.shape == theirs.shape
        scale = np.abs(theirs).max() + 1e-9
        assert np.abs(ours - theirs).max() / scale < 1e-4
    # feature maps: same count; compare one mid fmap per sub-discriminator
    for li in range(len(t_out[2])):
        assert len(j_out[2][li]) == len(t_out[2][li])
        ours = np.asarray(j_out[2][li][1])  # (B, H, W, C)
        theirs = t_out[2][li][1].numpy()  # (B, C, H, W)
        np.testing.assert_allclose(
            ours.transpose(0, 3, 1, 2), theirs, atol=1e-4 * np.abs(theirs).max()
        )


def test_mrd_parity(reference_dir, audio_pair):
    import_reference()
    from flow2gan.models.discriminators import (
        MultiResolutionDiscriminator as TorchMRD,
    )

    real, fake = audio_pair
    torch.manual_seed(1)
    tmrd = TorchMRD()
    tmrd.eval()
    jmrd = MultiResolutionDiscriminator()
    variables = _convert(tmrd, jmrd, (jnp.asarray(real), jnp.asarray(fake)))

    with torch.no_grad():
        t_out = tmrd(torch.from_numpy(real), torch.from_numpy(fake))
    j_out = jmrd.apply(variables, jnp.asarray(real), jnp.asarray(fake))

    for li in range(len(t_out[1])):  # scores fake
        ours = np.asarray(j_out[1][li])  # (B, T, F, 1)
        theirs = t_out[1][li].numpy()  # (B, 1, T, F)
        scale = np.abs(theirs).max() + 1e-9
        assert (
            np.abs(ours.transpose(0, 3, 1, 2) - theirs).max() / scale < 2e-4
        ), f"resolution {li}"


def test_gan_losses_match_reference_formulas(reference_dir, audio_pair):
    """Hinge/fmap/mel-recon loss values vs the reference GAN module."""
    import_reference()
    from flow2gan.models.gan import GAN as TorchGAN

    real, fake = audio_pair

    class DummyGen(torch.nn.Module):
        sampling_rate = 24000

    torch.manual_seed(2)
    tgan = TorchGAN(DummyGen())
    # synthetic score/fmap lists
    rng = np.random.RandomState(0)
    s_real = [rng.randn(1, 50).astype(np.float32) for _ in range(3)]
    s_fake = [rng.randn(1, 50).astype(np.float32) for _ in range(3)]
    f_real = [[rng.randn(1, 4, 6).astype(np.float32) for _ in range(2)] for _ in range(3)]
    f_fake = [[rng.randn(1, 4, 6).astype(np.float32) for _ in range(2)] for _ in range(3)]

    t_d = tgan.discriminator_loss(
        [torch.from_numpy(x) for x in s_real], [torch.from_numpy(x) for x in s_fake]
    ).item()
    j_d = float(discriminator_loss([jnp.asarray(x) for x in s_real], [jnp.asarray(x) for x in s_fake]))
    assert abs(t_d - j_d) < 1e-5

    t_g = tgan.generator_loss([torch.from_numpy(x) for x in s_fake]).item()
    j_g = float(generator_loss([jnp.asarray(x) for x in s_fake]))
    assert abs(t_g - j_g) < 1e-5

    t_fm = tgan.feature_matching_loss(
        [[torch.from_numpy(x) for x in fl] for fl in f_real],
        [[torch.from_numpy(x) for x in fl] for fl in f_fake],
    ).item()
    j_fm = float(
        feature_matching_loss(
            [[jnp.asarray(x) for x in fl] for fl in f_real],
            [[jnp.asarray(x) for x in fl] for fl in f_fake],
        )
    )
    assert abs(t_fm - j_fm) < 1e-5

    # mel recon: reference uses stub-torchaudio MelSpectrogram == our mel math
    t_mel = tgan.mel_recon_loss(torch.from_numpy(real), torch.from_numpy(fake)).item()
    mel_fns = make_mel_recon_fns(24000)
    j_mel = float(mel_recon_loss(jnp.asarray(real), jnp.asarray(fake), mel_fns))
    assert abs(t_mel - j_mel) / abs(t_mel) < 1e-3, (t_mel, j_mel)


@pytest.mark.parametrize("remat", [False, True])
def test_gan_train_steps_smoke(remat):
    """2 D-steps + 2 G-steps on the tiny generator: finite, params move.

    remat=True exercises the scan-body-remattered G-step (the 44.1 kHz
    4-step HBM fix, --remat-rollout) through the full jitted train step."""
    from flow2gan_tpu.models import build_generator, get_generator_config
    from flow2gan_tpu.models.discriminators import Discriminators
    from flow2gan_tpu.ops.mel import LogMelSpectrogram
    from flow2gan_tpu.training.gan_step import (
        GANLossScales,
        init_gan_train_state,
        make_gan_steps,
    )
    from flow2gan_tpu.training.optim import eden2_lr, scaled_adam

    cfg = get_generator_config("mel_24k_tiny")
    cfg["branch_dropout"] = 0.0  # reference disables it for GAN stage
    gen = build_generator(cfg)
    disc = Discriminators()
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate,
        n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length,
        n_mels=cfg.n_mels,
    )
    B, L = 2, 4096
    key = jax.random.PRNGKey(0)
    audio = 0.2 * jax.random.normal(key, (B, L))
    batch = {"audio": audio, "audio_lens": jnp.full((B,), L, jnp.int32)}

    cond = mel_fn(audio)
    params_g = gen.init(
        {"params": key, "noise": key}, cond, n_timesteps=1, method="infer"
    )["params"]
    params_d = disc.init(key, audio, audio)["params"]

    opt_g = scaled_adam(clipping_scale=2.0)
    opt_d = scaled_adam(clipping_scale=2.0)
    d_step, g_step, eval_step = make_gan_steps(
        gen,
        disc,
        mel_fn,
        make_mel_recon_fns(24000, (32, 64), (5, 10)),
        opt_g,
        opt_d,
        lr_g_fn=lambda b: eden2_lr(0.002, b, 20000.0),
        lr_d_fn=lambda b: eden2_lr(0.02, b, 5000.0),
        n_timesteps=2,
        scales=GANLossScales(),
        donate=False,
        remat_rollout=remat,
    )
    state = init_gan_train_state(params_g, params_d, opt_g, opt_d)
    g_before = jax.tree.map(np.asarray, state.params_g)
    d_before = jax.tree.map(np.asarray, state.params_d)

    for i in range(2):
        state, md = d_step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(md["loss_d"]))
    for i in range(2):
        state, mg = g_step(state, batch, jax.random.PRNGKey(10 + i))
        assert np.isfinite(float(mg["loss_g"]))
        assert np.isfinite(float(mg["mel_recon_loss"]))

    def moved_fraction(before, after):
        pairs = zip(jax.tree.leaves(before), jax.tree.leaves(after))
        # "moved" = changed at all (updates after one optimizer step can be
        # tiny; allclose would misclassify them)
        moved = [not np.array_equal(np.asarray(a), np.asarray(b)) for a, b in pairs]
        return sum(moved) / len(moved)

    # conv_post biases can get exactly-cancelling hinge grads at init, so
    # require most-but-not-all leaves to move
    assert moved_fraction(d_before, state.params_d) > 0.9
    assert moved_fraction(g_before, state.params_g) == 1.0
    assert int(state.batch_idx) == 4
    # D optimizer took 2 steps, G took 2
    assert int(state.opt_d.step) == 2 and int(state.opt_g.step) == 2

    m = eval_step(state.params_g, state.params_d, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss_g"]))
