"""Multi-device (8 virtual CPU devices) data-parallel training tests.

The key invariance: a train step jitted over an 8-device mesh with the batch
sharded on 'data' must produce the SAME new params as the unsharded step on
one device — DP is a layout, not a different algorithm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from flow2gan_tpu.training.optim import eden2_lr, scaled_adam
from flow2gan_tpu.training.train_step import (
    init_train_state,
    make_fm_train_step,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = get_generator_config("mel_24k_tiny")
    model = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate,
        n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length,
        n_mels=cfg.n_mels,
    )
    B, L = 8, 2048
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(0.3 * rng.randn(B, L).astype(np.float32)),
        "audio_lens": jnp.asarray([L] * B),
    }
    key = jax.random.PRNGKey(0)
    cond = mel_fn(batch["audio"])
    params = model.init(
        {"params": key, "noise": key, "gate": key, "dropout": key},
        cond,
        batch["audio"],
        batch["audio_lens"],
        train=True,
    )["params"]
    opt = scaled_adam(clipping_scale=2.0)
    step = make_fm_train_step(
        model, opt, lr_fn=lambda b: eden2_lr(0.035, b, 7500.0), mel_fn=mel_fn,
        donate=False,  # tests reuse params across steps
    )
    return model, opt, step, params, batch


def test_sharded_step_matches_single_device(setup):
    model, opt, step, params, batch = setup
    key = jax.random.PRNGKey(42)

    # single device
    state1 = init_train_state(params, opt)
    new1, m1 = step(state1, batch, key)

    # 8-device mesh, batch sharded on data
    mesh = make_mesh(("data",))
    state8 = init_train_state(replicate(params, mesh), opt)
    state8 = jax.tree.map(lambda x: x, state8)
    batch8 = shard_batch(batch, mesh)
    new8, m8 = step(state8, batch8, key)

    assert np.allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    flat1 = jax.tree.leaves(new1.params)
    flat8 = jax.tree.leaves(new8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_multi_step_training_descends(setup):
    model, opt, step, params, batch = setup
    mesh = make_mesh(("data",))
    state = init_train_state(replicate(params, mesh), opt)
    batch8 = shard_batch(batch, mesh)
    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(8):
        state, metrics = step(state, batch8, key)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # same batch, same rng folding per batch_idx: loss should drop
    assert losses[-1] < losses[0], losses
    assert int(state.batch_idx) == 8


@pytest.fixture(scope="module")
def gan_setup(setup):
    """Tiny GAN stack reusing the FM fixture's generator/batch.

    Covers the surface the reference trains with
    DDP(find_unused_parameters=True) (ref bin/finetune.py:915): alternating
    D/G steps where only one pytree gets gradients per step.
    """
    from flow2gan_tpu.models.discriminators import Discriminators
    from flow2gan_tpu.models.gan import make_mel_recon_fns
    from flow2gan_tpu.models import build_generator, get_generator_config
    from flow2gan_tpu.ops.mel import LogMelSpectrogram
    from flow2gan_tpu.training.gan_step import (
        init_gan_train_state,
        make_gan_steps,
    )

    cfg = dict(get_generator_config("mel_24k_tiny"))
    cfg["branch_dropout"] = 0.0
    generator = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg["sampling_rate"],
        n_fft=cfg["mel_n_fft"],
        hop_length=cfg["mel_hop_length"],
        n_mels=cfg["n_mels"],
    )
    discriminators = Discriminators(periods=(2, 3), fft_sizes=(256, 128))
    mel_recon_fns = make_mel_recon_fns(
        cfg["sampling_rate"], mel_recon_n_ffts=(64, 128), mel_recon_n_mels=(10, 20)
    )
    _, _, _, params_g_init, batch = setup
    key = jax.random.PRNGKey(5)
    params_d = discriminators.init(key, batch["audio"], batch["audio"])["params"]
    # generator params from the FM fixture were initialized by the same tiny
    # config (branch_dropout only affects apply-time behavior, not the tree)
    opt_g = scaled_adam(clipping_scale=2.0)
    opt_d = scaled_adam(clipping_scale=2.0)
    d_step, g_step, eval_step = make_gan_steps(
        generator,
        discriminators,
        mel_fn,
        mel_recon_fns,
        opt_g,
        opt_d,
        lr_g_fn=lambda b: eden2_lr(0.002, b, 20000.0),
        lr_d_fn=lambda b: eden2_lr(0.02, b, 5000.0),
        n_timesteps=2,
        donate=False,
    )
    return d_step, g_step, params_g_init, params_d, opt_g, opt_d, batch


def _trees_close(a, b, rtol=8e-3, atol=4e-4):
    # cross-device psum reduction order differs from the single-device sum;
    # ScaledAdam's early-step rsqrt scale estimates amplify that float noise
    # (observed: up to 2.4e-4 abs / 6.5e-3 rel on <0.1% of disc params
    # after one D+G step, varying run-to-run with the reduction schedule)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_sharded_gan_steps_match_single_device(gan_setup):
    """D then G step: 8-device sharded == unsharded (params and losses)."""
    from flow2gan_tpu.training.gan_step import init_gan_train_state

    d_step, g_step, params_g, params_d, opt_g, opt_d, batch = gan_setup
    key = jax.random.PRNGKey(11)

    state1 = init_gan_train_state(params_g, params_d, opt_g, opt_d)
    state1, md1 = d_step(state1, batch, key)
    state1, mg1 = g_step(state1, batch, key)

    mesh = make_mesh(("data",))
    state8 = init_gan_train_state(
        replicate(params_g, mesh), replicate(params_d, mesh), opt_g, opt_d
    )
    batch8 = shard_batch(batch, mesh)
    state8, md8 = d_step(state8, batch8, key)
    state8, mg8 = g_step(state8, batch8, key)

    assert np.allclose(float(md1["loss_d"]), float(md8["loss_d"]), rtol=1e-5)
    assert np.allclose(float(mg1["loss_g"]), float(mg8["loss_g"]), rtol=1e-4)
    _trees_close(state1.params_d, state8.params_d)
    _trees_close(state1.params_g, state8.params_g)
