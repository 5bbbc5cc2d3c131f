"""GAN-finetune throughput benchmark: alternating D/G step pairs per second
on one chip at the reference recipe shape (batch 64, 1.5 s crops,
mel_24k_base + MPD/MRD, n_timesteps=2 — run_libritts.sh stage 4 constants,
reference bin/finetune.py).

Same value-fenced timing protocol as bench.py (block_until_ready can ack
early on tunneled TPU runtimes; a scalar fetch from the last metric drains
the serially-executed device queue). Prints one JSON line. Secondary
benchmark (the driver records bench.py; this documents stage-2 training
perf).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main(batch=None, seconds=1.5, n_timesteps=2, n_pairs=5):
    from bench import tunnel_preflight

    tunnel_preflight(
        metric=f"gan_dg_pairs_per_sec_b{batch or 'auto'}", unit="pairs_per_sec"
    )
    if batch is None:
        # the G-step graph (remat rollout + MPD/MRD + mel scales) can OOM the
        # TPU compile service at large batch; fall back and report what ran
        for b in (64, 16, 4):
            try:
                return _run(b, seconds, n_timesteps, n_pairs)
            except Exception as e:  # noqa: BLE001 - compile-service failures
                print(f"# batch {b} failed: {str(e)[:120]}", file=sys.stderr)
        raise RuntimeError("all batch sizes failed")
    return _run(batch, seconds, n_timesteps, n_pairs)


def _run(batch, seconds, n_timesteps, n_pairs):
    from flow2gan_tpu.models import build_generator, get_generator_config
    from flow2gan_tpu.models.config import get_gan_config
    from flow2gan_tpu.models.discriminators import Discriminators
    from flow2gan_tpu.models.gan import make_mel_recon_fns
    from flow2gan_tpu.ops.mel import LogMelSpectrogram
    from flow2gan_tpu.training.gan_step import (
        GANLossScales,
        init_gan_train_state,
        make_gan_steps,
    )
    from flow2gan_tpu.training.optim import eden2_lr, scaled_adam

    cfg = get_generator_config("mel_24k_base")
    cfg["branch_dropout"] = 0.0
    gan_cfg = get_gan_config("gan_multi_scale_mel_recon")
    generator = build_generator(cfg)
    discriminators = Discriminators()
    mel_fn = LogMelSpectrogram(
        cfg.sampling_rate, cfg.mel_n_fft, cfg.mel_hop_length, cfg.n_mels
    )
    mel_recon_fns = make_mel_recon_fns(
        cfg.sampling_rate, gan_cfg.mel_recon_n_ffts, gan_cfg.mel_recon_n_mels
    )

    L = int(seconds * cfg.sampling_rate)
    rng = jax.random.PRNGKey(0)
    audio = 0.1 * jax.random.normal(rng, (batch, L), jnp.float32)
    batch_d = {"audio": audio, "audio_lens": jnp.full((batch,), L, jnp.int32)}

    params_g = generator.init(
        {"params": rng, "noise": rng}, mel_fn(audio[:2]), n_timesteps=1,
        method="infer",
    )["params"]
    params_d = discriminators.init(rng, audio[:2], audio[:2])["params"]

    opt_g = scaled_adam(clipping_scale=2.0)
    opt_d = scaled_adam(clipping_scale=2.0)
    d_step, g_step, _ = make_gan_steps(
        generator,
        discriminators,
        mel_fn,
        mel_recon_fns,
        opt_g,
        opt_d,
        lr_g_fn=lambda b: eden2_lr(0.002, b, 20000.0),
        lr_d_fn=lambda b: eden2_lr(0.02, b, 5000.0),
        n_timesteps=n_timesteps,
        scales=GANLossScales(),
        remat_rollout=True,
    )
    state = init_gan_train_state(params_g, params_d, opt_g, opt_d)

    # compile + warm with a TRUE completion fence
    state, md = d_step(state, batch_d, rng)
    state, mg = g_step(state, batch_d, rng)
    _ = float(mg["loss_g"])

    t0 = time.perf_counter()
    for _ in range(n_pairs):
        state, md = d_step(state, batch_d, rng)
        state, mg = g_step(state, batch_d, rng)
    _ = float(mg["loss_g"])  # value dependency drains the device queue
    dt = (time.perf_counter() - t0) / n_pairs
    result = {
        "metric": f"gan_dg_pairs_per_sec_b{batch}",
        "value": round(1.0 / dt, 3),
        "unit": "D+G pairs/s",
        "pair_ms": round(dt * 1e3, 1),
        "train_xrt": round(batch * seconds / dt, 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
