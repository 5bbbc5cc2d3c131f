"""Training-throughput benchmark: FM pretrain steps/sec on one chip at the
reference recipe shape (global batch 256, 1.5 s crops, mel_24k_base,
ScaledAdam + Eden2 — run_libritts.sh stage 2 constants).

Prints one JSON line with steps/sec and audio-seconds-trained/sec. Secondary
benchmark (the driver records bench.py; this one documents training perf).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main(batch=256, seconds=1.5, n_steps=20):
    from bench import tunnel_preflight

    tunnel_preflight(
        metric=f"fm_train_steps_per_sec_b{batch}", unit="steps_per_sec"
    )
    from flow2gan_tpu.models import build_generator, get_generator_config
    from flow2gan_tpu.ops.mel import LogMelSpectrogram
    from flow2gan_tpu.training.optim import eden2_lr, scaled_adam
    from flow2gan_tpu.training.train_step import (
        init_train_state,
        make_fm_train_step,
    )

    cfg = get_generator_config("mel_24k_base")
    model = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        cfg.sampling_rate, cfg.mel_n_fft, cfg.mel_hop_length, cfg.n_mels
    )
    L = int(seconds * cfg.sampling_rate)
    rng = jax.random.PRNGKey(0)
    audio = 0.1 * jax.random.normal(rng, (batch, L), jnp.float32)
    batch_d = {"audio": audio, "audio_lens": jnp.full((batch,), L, jnp.int32)}
    params = model.init(
        {"params": rng, "noise": rng, "gate": rng, "dropout": rng},
        mel_fn(audio),
        audio,
        batch_d["audio_lens"],
        train=True,
    )["params"]
    opt = scaled_adam(clipping_scale=2.0)
    step = make_fm_train_step(
        model, opt, lr_fn=lambda b: eden2_lr(0.035, b, 7500.0), mel_fn=mel_fn
    )
    state = init_train_state(params, opt)

    state, m = step(state, batch_d, rng)  # compile
    _ = float(m["loss"])  # value dependency = TRUE completion fence
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, batch_d, rng)
    # block_until_ready can ack early on tunneled TPU runtimes (see bench.py);
    # fetching the loss value drains the serially-executed device queue.
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    result = {
        "metric": "fm_train_steps_per_sec_b256",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        # dimensionless x-real-time: seconds of training audio per wall second
        "train_xrt": round(batch * seconds / dt, 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
