"""Normalization / stabilization primitives (Zipformer lineage), TPU-native.

Re-designs the reference's custom-autograd tricks
(/root/reference/flow2gan/models/modules.py:236-416) as JAX `custom_vjp`
functions + flax modules in channels-last layout:

- `limit_param_value`: flips gradient signs to push a parameter back into
  [min, max]; applied stochastically (prob 0.6) during training.
- `BiasNorm`: LayerNorm replacement `x * rsqrt(mean((x-bias)^2)) * exp(s)`.
  The reference's memory-saving recompute-in-backward autograd is unnecessary
  here: XLA rematerializes under `jax.checkpoint`, applied at block level.
- `ChannelScale`: learned residual scale limited to [0.5, 1.0].
- `PReLU`: per-channel parametric ReLU (torch semantics).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# When enabled (scalar-diagnostics mode only), PReLU outputs get a flax
# `perturb` tap so jax.grad w.r.t. the 'perturbations' collection yields
# dL/d(activation) — the JAX replacement for the reference's backward hooks
# on nonlinearity modules (ScalarDiagnostic, diagnostics.py:337-511).
# Off by default: perturb taps are a no-op at apply time but materialize
# activation-sized zero buffers at init time.
_DIAG_PERTURB = False


@contextlib.contextmanager
def diagnostic_perturbations():
    """Enable PReLU perturbation taps for init/apply traced inside."""
    global _DIAG_PERTURB
    prev = _DIAG_PERTURB
    _DIAG_PERTURB = True
    try:
        yield
    finally:
        _DIAG_PERTURB = prev


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _limit_value(x: jnp.ndarray, gate: jnp.ndarray, lo: float, hi: float):
    return x


def _limit_value_fwd(x, gate, lo, hi):
    return x, (x, gate)


def _limit_value_bwd(lo, hi, res, g):
    x, gate = res
    active = gate > 0.5
    # where x < lo, make positive grads negative (pushes x up);
    # where x > hi, make negative grads positive (pushes x down).
    # (reference LimitParamValue.backward, modules.py:246-256)
    flip_lo = jnp.where(active & (g > 0) & (x < lo), -1.0, 1.0)
    flip_hi = jnp.where(active & (g < 0) & (x > hi), -1.0, 1.0)
    return (g * flip_lo * flip_hi, jnp.zeros_like(gate))


_limit_value.defvjp(_limit_value_fwd, _limit_value_bwd)


def limit_param_value(
    x: jnp.ndarray,
    min: float,
    max: float,
    gate: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Identity in the forward pass; in backward, redirects gradients so the
    parameter drifts back into [min, max] (reference modules.py:259-270).

    Args:
      gate: scalar float 0/1 array — whether the limiter is active this step
        (the reference samples `random.random() < 0.6` per call during
        training). None disables it (eval).
    """
    if gate is None:
        return x
    return _limit_value(x, gate, float(min), float(max))


def _gate(module: nn.Module, train: bool, prob: float = 0.6) -> Optional[jnp.ndarray]:
    """Per-call Bernoulli(prob) gate for limit_param_value during training."""
    if not train:
        return None
    key = module.make_rng("gate")
    return jax.random.bernoulli(key, prob).astype(jnp.float32)


class BiasNorm(nn.Module):
    """x * rsqrt(mean((x - bias)^2, channel)) * exp(log_scale).

    Channels-last (the channel dim is the last axis). Reference
    modules.py:286-416 (channel_dim=1 there; layout transposed here).
    """

    num_channels: int
    log_scale_init: float = 1.0
    log_scale_min: float = -1.5
    log_scale_max: float = 1.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bias = self.param(
            "bias",
            lambda k, s: 1e-2 * jax.random.normal(k, s, jnp.float32),
            (self.num_channels,),
        )
        log_scale = self.param(
            "log_scale", lambda k: jnp.asarray(self.log_scale_init, jnp.float32)
        )
        log_scale = limit_param_value(
            log_scale, self.log_scale_min, self.log_scale_max, _gate(self, train)
        )
        d = (x - bias).astype(jnp.float32)
        scales = jax.lax.rsqrt(jnp.mean(d * d, axis=-1, keepdims=True)) * jnp.exp(
            log_scale
        )
        return x * scales.astype(x.dtype)


class ChannelScale(nn.Module):
    """Learned per-channel residual scale, limited to [0.5, 1.0] for training
    stability (reference modules.py:273-283)."""

    channels: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param(
            "scale",
            lambda k, s: jnp.full(s, self.init_scale, jnp.float32),
            (self.channels,),
        )
        scale = limit_param_value(scale, 0.5, 1.0, _gate(self, train))
        return x * scale.astype(x.dtype)


class PReLU(nn.Module):
    """Per-channel parametric ReLU, torch semantics (init 0.25)."""

    channels: int
    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha",
            lambda k, s: jnp.full(s, self.init_alpha, jnp.float32),
            (self.channels,),
        )
        y = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        if _DIAG_PERTURB:
            y = self.perturb("act", y)
        return y
