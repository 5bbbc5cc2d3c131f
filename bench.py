"""Headline benchmark: x-real-time 24 kHz synthesis, batch 16, 1 s audio,
1-step Euler (the reference's speed table setting, BASELINE.md: 851.67 xRT on
the paper's GPU). Runs on jax.devices()[0] (the real TPU chip under the
driver).

Timing protocol: on remotely-tunneled TPU runtimes `block_until_ready()` can
acknowledge before device execution actually finishes (verified here with a
110-TFLOP chained matmul "completing" in 0.1 ms), which silently inflates
throughput ~16x. The only trustworthy fence is a value dependency, so each
timed loop enqueues n_iters calls and then fetches ONE scalar from the last
output — the device executes its queue serially, so the fetch drains all
n_iters programs, and the scalar transfer itself costs ~0.07 ms (amortized
over n_iters). Both compute dtypes are measured in the same process, best-of-3
per dtype to dodge tunnel noise. Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_XRT_GPU_1STEP = 851.67  # reference paper speed table (BASELINE.md)


def measure(compute_dtype, batch=16, seconds=1.0, n_iters=100, n_timesteps=1,
            model_name="mel_24k_base"):
    """n_iters=100: the per-call cost only reaches steady state once the
    enqueue pipeline is deep — 20 iters under-amortized the fence + ramp-up
    and reported ~25% low (measured r2: 3878 -> 5226 xRT, same kernels)."""
    from flow2gan_tpu.models import build_generator, get_generator_config

    cfg = get_generator_config(model_name)
    cfg["compute_dtype"] = compute_dtype
    model = build_generator(cfg)
    rng = jax.random.PRNGKey(0)
    frames = 1 + int(seconds * cfg.sampling_rate) // cfg.mel_hop_length  # 94
    cond = jax.random.normal(rng, (batch, cfg.n_mels, frames), jnp.float32)
    variables = model.init(
        {"params": rng, "noise": rng}, cond, n_timesteps=1, method="infer"
    )

    @jax.jit
    def synth(variables, cond, key, step):
        # fold the key INSIDE jit: host-side fold_in costs ~0.3 ms/call of
        # dispatch work, which throttles how fast the queue can be fed
        return model.apply(
            variables,
            cond,
            n_timesteps=n_timesteps,
            clamp_pred=True,
            method="infer",
            rngs={"noise": jax.random.fold_in(key, step)},
        )

    # AOT-compile: python-side jit dispatch (cache lookup, pytree flatten of
    # the 425-leaf variables dict) costs ~0.05 ms/call through the tunnel;
    # the compiled handle skips it.
    compiled = synth.lower(variables, cond, rng, jnp.int32(0)).compile()

    out = compiled(variables, cond, rng, jnp.int32(0))
    _ = float(out.ravel()[0])  # warm-up with a TRUE completion fence
    audio_seconds = out.shape[0] * out.shape[1] / cfg.sampling_rate

    steps = [jnp.int32(i) for i in range(n_iters)]  # pre-staged scalars
    best = float("inf")
    for _ in range(3):  # best-of-3 repeats to dodge tunnel noise
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = compiled(variables, cond, rng, steps[i])
        _ = float(out.ravel()[0])  # value dependency drains the device queue
        best = min(best, (time.perf_counter() - t0) / n_iters)
    return audio_seconds / best


def tunnel_preflight(
    raise_error=False, metric="xrt_24k_1step_b16", unit="x_realtime"
):
    """Fail fast (ONE JSON line, rc 2) when the axon TPU tunnel is down.

    On this runtime the TPU is reached through a driver-owned relay
    listening on 127.0.0.1:8082-8117; if that relay process is dead, the
    first jax backend touch blocks FOREVER in the claim loop (observed:
    a trainer froze mid-checkpoint-save, and every subsequent jax client
    hung at init). A bench that hangs stalls the whole round, so probe
    the relay ports with plain sockets before touching jax.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # not the tunneled-TPU runtime
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "axon" not in plats:
        return  # jax pinned to another backend; no claim will happen
    import socket

    for port in (8082, 8083, 8092, 8093, 8102, 8103, 8112, 8113):
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", port))
            return  # relay alive
        except OSError:
            continue
        finally:
            s.close()
    msg = (
        "TPU tunnel relay down (no listener on 127.0.0.1:8082-8113) — "
        "aborting instead of hanging in the axon claim; see "
        ".claude/skills/verify/SKILL.md"
    )
    if raise_error:
        raise RuntimeError(msg)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": 0.0,
                "unit": unit,
                "vs_baseline": 0.0,
                "error": msg,
            }
        )
    )
    sys.exit(2)


class CompileWatchdog:
    """Fail closed when the remote compile helper is wedged.

    A second tunnel failure mode (observed round 5): the relay ports accept
    TCP and cached programs still run, but every NEW compile hangs forever
    inside the helper (`/remote_compile` never answers). The socket
    preflight above cannot see this, so run each phase under a per-phase
    budget: `kick()` re-arms the timer at every phase boundary (each phase
    is one measure() = at most one compile + timing, ≤5 min healthy even
    contended), and if any single phase exceeds the budget, print the ONE
    JSON error line and exit 2 instead of stalling the round. Per-phase —
    not whole-run — so a healthy-but-slow bench (many compiles) keeps
    re-proving progress and is never killed. No-op off the tunneled
    runtime.
    """

    def __init__(self, metric="xrt_24k_1step_b16", unit="x_realtime"):
        self._timer = None
        self.active = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
        plats = os.environ.get("JAX_PLATFORMS", "")
        if plats and "axon" not in plats:
            self.active = False  # jax pinned elsewhere; no helper involved
        self.budget = float(os.environ.get("BENCH_WATCHDOG_S", "900"))
        self.metric, self.unit = metric, unit

    def _abort(self):
        print(
            json.dumps(
                {
                    "metric": self.metric,
                    "value": 0.0,
                    "unit": self.unit,
                    "vs_baseline": 0.0,
                    "error": (
                        f"bench phase exceeded {self.budget:.0f}s — TPU "
                        "compile helper wedged (relay up, compiles hang); "
                        "see .claude/skills/verify/SKILL.md wedge protocol"
                    ),
                }
            ),
            flush=True,
        )
        os._exit(2)

    def kick(self):
        if not self.active:
            return
        import threading

        if self._timer is not None:
            self._timer.cancel()
        self._timer = threading.Timer(self.budget, self._abort)
        self._timer.daemon = True
        self._timer.start()

    def cancel(self):
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None


def main():
    tunnel_preflight()
    watchdog = CompileWatchdog()
    watchdog.kick()
    # Host CPU contention throttles the enqueue pipeline and silently
    # halves reported xRT (measured: 44k 2.3k busy vs 5.1k idle) — flag it.
    load = os.getloadavg()[0] / max(os.cpu_count() or 1, 1)
    if load > 0.5:
        print(
            f"WARNING: host loadavg {load:.1f} — numbers will read low; "
            f"rerun on an idle host",
            file=sys.stderr,
        )
    forced = os.environ.get("BENCH_DTYPE")
    if forced:
        candidates = [None if forced in ("float32", "f32") else forced]
    else:
        candidates = [None, "bfloat16"]
    def timed(*a, **kw):  # one phase = one measure(); re-arm per phase
        watchdog.kick()
        return measure(*a, **kw)

    results = {(d or "float32"): timed(d) for d in candidates}
    dtype, xrt = max(results.items(), key=lambda kv: kv[1])
    best_d = None if dtype == "float32" else dtype
    multi = {
        f"{n}step": round(timed(best_d, n_timesteps=n), 1) for n in (2, 4)
    }
    xrt_44k = round(
        timed(best_d, model_name="mel_44k_128band_512x_base"), 1
    )
    result = {
        "metric": "xrt_24k_1step_b16",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / BASELINE_XRT_GPU_1STEP, 3),
        "config": (
            f"compute_dtype={dtype}, "
            f"1step={ {k: round(v, 1) for k, v in results.items()} }, "
            f"multi={multi}, 44k_1step={xrt_44k} "
            f"(ref GPU: 449.3 2step / 228.5 4step)"
        ),
    }
    watchdog.cancel()
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
