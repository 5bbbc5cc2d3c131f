#!/usr/bin/env python
"""Compile-only TPU shape sweep: AOT-lower + compile the model's synthesis
program across a {model} x {batch} x {duration} grid, executing nothing.

Every on-chip failure in rounds 3-4 (60 s whole-file VMEM OOM, scanned-
rollout scoped-VMEM OOM, 4-step HBM OOM, and the b=8 x 5.6 s scoped-VMEM OOM
that emptied results/r4_generalization) was a *compile-time* failure
discovered by burning drive time. This sweep turns that class into a
pre-drive check: run it before any evidence drive; a red row means the shape
class would crash mid-drive. Uses jax.eval_shape for the params so nothing
is materialized on the device; only the compiler runs.

Reference analogue: the reference has no such tool (torch eager never fails
this way); this is TPU-specific infrastructure the XLA compilation model
requires.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_sweep.py \
      [--models mel_24k_base mel_44k_base] [--batches 1 8 16] \
      [--durations 1.0 5.65 20.0 60.0] [--n-timesteps 1 4]

Exit status is nonzero if ANY cell fails to compile (fail-closed, like the
round-5 evidence chain).
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

from flow2gan_tpu.models import build_generator
from flow2gan_tpu.models.config import get_generator_config


def sweep(model_names, batches, durations, n_timesteps_list) -> int:
    failures = 0
    for name in model_names:
        cfg = get_generator_config(name)
        model = build_generator(cfg)
        rng = jax.random.PRNGKey(0)
        mel_hop = cfg.mel_hop_length

        token_cond = cfg.get("conditioning") == "tokens"
        for dur in durations:
            n_samples = int(dur * cfg.sampling_rate)
            t_mel = n_samples // mel_hop
            for batch in batches:
                if token_cond:
                    cond_sds = jax.ShapeDtypeStruct((batch, t_mel), jnp.int32)
                else:
                    cond_sds = jax.ShapeDtypeStruct(
                        (batch, cfg.n_mels, t_mel), jnp.float32
                    )
                params_sds = jax.eval_shape(
                    lambda c: model.init(
                        {"params": rng, "noise": rng},
                        c, n_timesteps=1, method="infer",
                    )["params"],
                    cond_sds,
                )
                for n in n_timesteps_list:
                    def synth(params, cond, key, n=n):
                        return model.apply(
                            {"params": params}, cond, n_timesteps=n,
                            clamp_pred=True, method="infer",
                            rngs={"noise": key},
                        )

                    tag = (f"{name} b={batch} dur={dur:g}s "
                           f"(t_mel={t_mel}) n={n}")
                    t0 = time.perf_counter()
                    try:
                        jax.jit(synth).lower(
                            params_sds, cond_sds,
                            jax.ShapeDtypeStruct((2,), jnp.uint32),
                        ).compile()
                        print(f"OK   {tag}  [{time.perf_counter()-t0:.1f}s]",
                              flush=True)
                    except Exception as e:  # noqa: BLE001
                        failures += 1
                        msg = str(e)
                        i = msg.find("Scoped allocation")
                        if i < 0:
                            i = msg.find("Ran out of memory")
                        print(f"FAIL {tag}: "
                              f"{msg[i:i+160] if i >= 0 else msg[:300]}",
                              flush=True)
    return failures


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+", default=["mel_24k_base"])
    p.add_argument("--batches", nargs="+", type=int, default=[1, 8, 16])
    p.add_argument("--durations", nargs="+", type=float,
                   default=[1.0, 3.0, 5.65, 20.0])
    p.add_argument("--n-timesteps", nargs="+", type=int, default=[1])
    args = p.parse_args()

    if jax.default_backend() != "tpu":
        print(f"WARNING: backend is {jax.default_backend()}, not tpu — "
              "this sweep only predicts chip behavior on the TPU backend",
              flush=True)
    failures = sweep(args.models, args.batches, args.durations,
                     args.n_timesteps)
    print(f"SWEEP_{'FAIL' if failures else 'OK'} failures={failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
