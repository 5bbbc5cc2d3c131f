"""Headline benchmark: x-real-time 24 kHz synthesis, batch 16, 1 s audio,
1-step Euler (the reference's speed table setting, BASELINE.md: 851.67 xRT on
the paper's GPU). Runs on whatever jax.devices()[0] is (the real TPU chip
under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_XRT_GPU_1STEP = 851.67  # reference paper speed table (BASELINE.md)


def main():
    from flow2gan_tpu.models import build_generator, get_generator_config

    cfg = get_generator_config("mel_24k_base")
    # bf16 compute is the TPU serving configuration (params stay f32;
    # FFT/iSTFT stay f32); ~4x over f32 on v5e, 43 dB SNR vs the f32 output.
    cfg["compute_dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    if cfg["compute_dtype"] in ("float32", "f32"):
        cfg["compute_dtype"] = None
    model = build_generator(cfg)
    rng = jax.random.PRNGKey(0)

    batch = 16
    seconds = 1.0
    frames = 1 + int(seconds * cfg.sampling_rate) // cfg.mel_hop_length  # 94
    cond = jax.random.normal(rng, (batch, cfg.n_mels, frames), jnp.float32)

    variables = model.init(
        {"params": rng, "noise": rng}, cond, n_timesteps=1, method="infer"
    )

    @jax.jit
    def synth(variables, cond, key):
        return model.apply(
            variables,
            cond,
            n_timesteps=1,
            clamp_pred=True,
            method="infer",
            rngs={"noise": key},
        )

    # warmup / compile
    out = synth(variables, cond, rng)
    out.block_until_ready()
    audio_seconds = out.shape[0] * out.shape[1] / cfg.sampling_rate

    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = synth(variables, cond, jax.random.fold_in(rng, i))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    xrt = audio_seconds / dt
    result = {
        "metric": "xrt_24k_1step_b16",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / BASELINE_XRT_GPU_1STEP, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
