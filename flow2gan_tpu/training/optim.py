"""ScaledAdam + Eden learning-rate schedules, JAX/TPU-native.

Re-implements the reference optimizer semantics
(/root/reference/flow2gan/optim.py:125-951) as a pure pytree transformation
that runs entirely inside one jitted train step:

- per-tensor update scaling by parameter RMS, with the parameter *size*
  (scale) separately learned and updated every `size_update_period` steps
  (optim.py:154-239);
- adaptive global gradient clipping to `clipping_scale` x the median of the
  last `clipping_update_period` steps' param-rms-normalized gradient norms,
  with the reference's exact threshold schedule (recalibrated at steps
  10/20/40 with a 2x safety factor, then every 100 steps; optim.py:509-619);
- scalar parameters (numel==1) get `scalar_lr_scale` and a +-scalar_max clamp
  (optim.py:501-503).

The reference's BatchedOptimizer stacking trick (optim.py:30-122) is a CUDA
kernel-launch optimization and is intentionally absent: a jitted pytree
update is already a single fused XLA program.

Interface is optax-style:

    opt = scaled_adam(clipping_scale=2.0)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params, lr=0.035)
    params = optax.apply_updates(params, updates)

Numerics are golden-tested against the reference torch implementation in
tests/test_optim.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ScaledAdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    exp_avg_sq: Any  # pytree like params
    delta: Any  # pytree like params (momentum of the update)
    param_rms: Any  # pytree of scalars (meaningful for non-scalar leaves)
    scale_grads: Any  # pytree of (size_update_period,) buffers
    scale_exp_avg_sq: Any  # pytree of scalars
    model_norms: jnp.ndarray  # (clipping_update_period,) history of grad norms
    model_norm_threshold: jnp.ndarray  # f32 scalar (inf until calibrated)
    num_clipped: jnp.ndarray  # int32, since last threshold update
    clip_scale: jnp.ndarray  # f32, last applied clipping factor (diagnostics)


@dataclasses.dataclass(frozen=True)
class ScaledAdam:
    lr: float = 3e-2
    clipping_scale: Optional[float] = None
    betas: tuple = (0.9, 0.98)
    scalar_lr_scale: float = 0.1
    eps: float = 1e-8
    param_min_rms: float = 1e-5
    param_max_rms: float = 3.0
    scalar_max: float = 10.0
    size_update_period: int = 4
    clipping_update_period: int = 100

    # ------------------------------------------------------------------ init

    def init(self, params) -> ScaledAdamState:
        f32 = lambda p: jnp.zeros_like(p, dtype=jnp.float32)

        def rms0(p):
            if p.size == 1:
                return jnp.zeros((), jnp.float32)
            return jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2))

        return ScaledAdamState(
            step=jnp.zeros((), jnp.int32),
            exp_avg_sq=jax.tree.map(f32, params),
            delta=jax.tree.map(f32, params),
            param_rms=jax.tree.map(rms0, params),
            scale_grads=jax.tree.map(
                lambda p: jnp.zeros((self.size_update_period,), jnp.float32), params
            ),
            scale_exp_avg_sq=jax.tree.map(
                lambda p: jnp.zeros((), jnp.float32), params
            ),
            model_norms=jnp.zeros((self.clipping_update_period,), jnp.float32),
            model_norm_threshold=jnp.asarray(jnp.inf, jnp.float32),
            num_clipped=jnp.zeros((), jnp.int32),
            clip_scale=jnp.ones((), jnp.float32),
        )

    # -------------------------------------------------------------- clipping

    def _clipping_scale(self, grads, state: ScaledAdamState):
        """Reference _get_clipping_scale (optim.py:509-619), vectorized.

        Deliberately does NOT incorporate per-leaf lr scaling: the
        reference's clipping norm weights leaves by param_rms (and
        scalar_lr_scale for scalars) only — per-group lr factors affect the
        update, not the clipping statistic.
        """
        step = state.step
        period = self.clipping_update_period

        def leaf_sumsq(g, rms):
            g = g.astype(jnp.float32)
            if g.size == 1:
                return jnp.sum(g**2) * (self.scalar_lr_scale**2)
            return jnp.sum((g * rms) ** 2)

        tot_sumsq = jax.tree.reduce(
            jnp.add, jax.tree.map(leaf_sumsq, grads, state.param_rms)
        )
        tot_norm = jnp.sqrt(tot_sumsq)

        # history write (skipped at step 0, matching the early return)
        written = state.model_norms.at[step % period].set(tot_norm)
        model_norms = jnp.where(step >= 1, written, state.model_norms)

        # threshold recalibration schedule
        sorted_norms = jnp.sort(model_norms)

        def median_of_last(n: int) -> jnp.ndarray:
            # reference quartile index: min(n-1, (n//4) * 2) into the last n
            idx = period - n + min(n - 1, (n // 4) * 2)
            return sorted_norms[idx]

        threshold = state.model_norm_threshold
        for s in (10, 20, 40):
            if s < period:
                threshold = jnp.where(
                    step == s,
                    2.0 * self.clipping_scale * median_of_last(s),
                    threshold,
                )
        threshold = jnp.where(
            (step % period == 0) & (step > 0),
            self.clipping_scale * median_of_last(period),
            threshold,
        )
        recalibrated = (
            jnp.isin(step, jnp.asarray([10, 20, 40]))
            | ((step % period == 0) & (step > 0))
        )

        ans = jnp.minimum(1.0, threshold / (tot_norm + 1.0e-20))
        # inf threshold = not yet calibrated -> no clipping;
        # NaN threshold = too many non-finite grads in the history window ->
        # zero all grads (the reference raises "Too many grads were not
        # finite" here, optim.py:574-575; inside jit we zero instead and the
        # trainer's clip_scale==0 watchdog surfaces it)
        ans = jnp.where(jnp.isposinf(threshold), 1.0, ans)
        ans = jnp.where(jnp.isnan(threshold) | jnp.isnan(ans), 0.0, ans)
        ans = jnp.where(step == 0, 1.0, ans)
        # non-finite gradients ALWAYS zero the update, including before the
        # threshold is calibrated (steps 0-9) — one poisoned batch must never
        # corrupt the params (stronger than the reference, which relied on
        # the fp16 grad-scaler to catch this window)
        ans = jnp.where(jnp.isfinite(tot_norm), ans, 0.0)

        num_clipped = jnp.where(recalibrated, 0, state.num_clipped)
        num_clipped = num_clipped + (ans < 1.0).astype(jnp.int32)
        return ans, model_norms, threshold, num_clipped

    # ---------------------------------------------------------------- update

    def update(self, grads, state: ScaledAdamState, params, lr, lr_scale=None):
        """One step. Returns (updates, new_state); apply with
        optax.apply_updates. `lr` is the scheduled learning rate; `lr_scale`
        an optional pytree of per-leaf multipliers (the reference's
        get_parameter_groups_with_lrs machinery, utils.py:69-138)."""
        beta1, beta2 = self.betas
        T = self.size_update_period
        step = state.step
        fstep = step.astype(jnp.float32)

        if lr_scale is None:
            lr_scale = jax.tree.map(lambda p: 1.0, params)

        if self.clipping_scale is not None:
            clip, model_norms, threshold, num_clipped = self._clipping_scale(
                grads, state
            )
        else:
            clip = jnp.ones((), jnp.float32)
            model_norms = state.model_norms
            threshold = state.model_norm_threshold
            num_clipped = state.num_clipped

        bc2 = 1.0 - beta2 ** (fstep + 1.0)
        is_rms_step = step % T == T - 1
        beta2_corr = beta2**T
        size_step = ((step + 1) // T).astype(jnp.float32)
        bc2_size = 1.0 - beta2_corr**size_step
        do_size_update = is_rms_step & (step > 0)

        def leaf(g, p, eas, delta, rms, sg, seas, ls):
            # clip == 0 must ZERO the grads (reference p.grad.zero_(),
            # optim.py:615-617): plain g * 0 would keep NaNs (NaN * 0 = NaN)
            g = jnp.where(
                clip > 0.0, g.astype(jnp.float32) * clip, jnp.zeros_like(g, jnp.float32)
            )
            p32 = p.astype(jnp.float32)
            is_scalar = p.size == 1

            eas = beta2 * eas + (1.0 - beta2) * g * g
            eas_used = jnp.where(bc2 < 0.99, eas / bc2, eas)
            denom = jnp.sqrt(eas_used) + self.eps
            lr_eff = lr * ls * (self.scalar_lr_scale if is_scalar else 1.0)
            d = -lr_eff * g / denom

            if not is_scalar:
                sg = sg.at[step % T].set(jnp.sum(p32 * g))
                new_rms = jnp.where(
                    is_rms_step, jnp.sqrt(jnp.mean(p32**2)), rms
                )
                d = d * jnp.maximum(new_rms, self.param_min_rms)

                # learned size update (reference optim.py:196-239)
                size_lr = lr * ls * self.scalar_lr_scale
                new_seas = beta2_corr * seas + (1.0 - beta2_corr) * jnp.mean(sg**2)
                denom_s = jnp.sqrt(new_seas) + self.eps
                scale_step = (
                    -size_lr * jnp.sqrt(bc2_size) * jnp.sum(sg) / denom_s
                )
                scale_step = jnp.where(new_rms < self.param_min_rms, 0.0, scale_step)
                scale_step = jnp.clip(scale_step, -0.1, 0.1)
                scale_step = jnp.minimum(
                    scale_step, (self.param_max_rms - new_rms) / new_rms
                )
                d = jnp.where(do_size_update, d + p32 * scale_step, d)
                seas = jnp.where(do_size_update, new_seas, seas)
                rms = new_rms

            delta = beta1 * delta + (1.0 - beta1) * d
            new_p = p32 + delta
            if is_scalar:
                new_p = jnp.clip(new_p, -self.scalar_max, self.scalar_max)
            upd = (new_p - p32).astype(p.dtype)
            return upd, eas, delta, rms, sg, seas

        results = jax.tree.map(
            leaf,
            grads,
            params,
            state.exp_avg_sq,
            state.delta,
            state.param_rms,
            state.scale_grads,
            state.scale_exp_avg_sq,
            lr_scale,
        )
        treedef = jax.tree.structure(params)
        leaves = jax.tree.leaves(results, is_leaf=lambda x: isinstance(x, tuple))
        unzipped = list(zip(*leaves))
        updates, eas, delta, rms, sg, seas = (
            jax.tree.unflatten(treedef, u) for u in unzipped
        )

        new_state = ScaledAdamState(
            step=step + 1,
            exp_avg_sq=eas,
            delta=delta,
            param_rms=rms,
            scale_grads=sg,
            scale_exp_avg_sq=seas,
            model_norms=model_norms,
            model_norm_threshold=threshold,
            num_clipped=num_clipped,
            clip_scale=clip,
        )
        return updates, new_state


def scaled_adam(**kwargs) -> ScaledAdam:
    return ScaledAdam(**kwargs)


# ----------------------------------------------------------------- schedules


def eden2_lr(
    base_lr: float,
    batch: jnp.ndarray,
    lr_batches: float,
    warmup_batches: float = 500.0,
    warmup_start: float = 0.5,
) -> jnp.ndarray:
    """Eden2: lr = base * ((batch^2+B^2)/B^2)^-0.5 * warmup
    (reference optim.py:904-951). Works on traced or python scalars."""
    b = jnp.asarray(batch, jnp.float32)
    factor = ((b**2 + lr_batches**2) / lr_batches**2) ** -0.5
    warmup = jnp.where(
        b >= warmup_batches,
        1.0,
        warmup_start + (1.0 - warmup_start) * (b / warmup_batches),
    )
    return base_lr * factor * warmup


def eden_lr(
    base_lr: float,
    batch: jnp.ndarray,
    epoch: jnp.ndarray,
    lr_batches: float,
    lr_epochs: float,
    warmup_batches: float = 500.0,
    warmup_start: float = 0.5,
) -> jnp.ndarray:
    """Eden (epoch-aware): reference optim.py:842-901."""
    b = jnp.asarray(batch, jnp.float32)
    e = jnp.asarray(epoch, jnp.float32)
    factor = ((b**2 + lr_batches**2) / lr_batches**2) ** -0.25 * (
        (e**2 + lr_epochs**2) / lr_epochs**2
    ) ** -0.25
    warmup = jnp.where(
        b >= warmup_batches,
        1.0,
        warmup_start + (1.0 - warmup_start) * (b / warmup_batches),
    )
    return base_lr * factor * warmup


@dataclasses.dataclass
class LRScheduler:
    """Stateful batch/epoch scheduler wrapper (reference optim.py:743-840)."""

    lr_fn: Callable[..., jnp.ndarray]
    batch: int = 0
    epoch: int = 0

    def step_batch(self, batch: Optional[int] = None):
        self.batch = batch if batch is not None else self.batch + 1

    def step_epoch(self, epoch: Optional[int] = None):
        self.epoch = epoch if epoch is not None else self.epoch + 1

    def get_lr(self) -> float:
        return float(self.lr_fn(batch=self.batch, epoch=self.epoch))

    def state_dict(self):
        return {"batch": self.batch, "epoch": self.epoch}

    def load_state_dict(self, d):
        self.batch = int(d["batch"])
        self.epoch = int(d["epoch"])


def make_eden2(base_lr: float, lr_batches: float, warmup_batches: float = 500.0,
               warmup_start: float = 0.5) -> LRScheduler:
    return LRScheduler(
        lr_fn=lambda batch, epoch: eden2_lr(
            base_lr, batch, lr_batches, warmup_batches, warmup_start
        )
    )


def make_eden(base_lr: float, lr_batches: float, lr_epochs: float,
              warmup_batches: float = 500.0, warmup_start: float = 0.5) -> LRScheduler:
    return LRScheduler(
        lr_fn=lambda batch, epoch: eden_lr(
            base_lr, batch, epoch, lr_batches, lr_epochs, warmup_batches, warmup_start
        )
    )


# ------------------------------------------------------------- Eve (baseline)


class EveState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any


@dataclasses.dataclass(frozen=True)
class Eve:
    """AdamW variant with target-rms-conditional weight decay — the
    reference's baseline optimizer (reference optim.py:980-1119). Weight decay
    is applied only while a non-scalar parameter's norm exceeds
    target_rms * sqrt(numel)."""

    lr: float = 1e-3
    betas: tuple = (0.9, 0.98)
    eps: float = 1e-8
    weight_decay: float = 1e-3
    target_rms: float = 0.1

    def init(self, params) -> EveState:
        z = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
        return EveState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(z, params),
            exp_avg_sq=jax.tree.map(z, params),
        )

    def update(self, grads, state: EveState, params, lr=None):
        lr = self.lr if lr is None else lr
        beta1, beta2 = self.betas
        step = state.step + 1
        fstep = step.astype(jnp.float32)
        bc1 = 1.0 - beta1**fstep
        bc2 = 1.0 - beta2**fstep

        def leaf(g, p, m, v):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            m = beta1 * m + (1.0 - beta1) * g
            v = beta2 * v + (1.0 - beta2) * g * g
            denom = jnp.sqrt(v) * (bc2**-0.5) + self.eps
            step_size = lr / bc1
            new_p = p32
            if p.size > 1:
                above = jnp.linalg.norm(p32) > (
                    self.target_rms * (p.size**0.5)
                )
                new_p = new_p * (1.0 - self.weight_decay * above)
            new_p = new_p - step_size * m / denom
            return (new_p - p32).astype(p.dtype), m, v

        results = jax.tree.map(leaf, grads, params, state.exp_avg, state.exp_avg_sq)
        treedef = jax.tree.structure(params)
        leaves = jax.tree.leaves(results, is_leaf=lambda x: isinstance(x, tuple))
        upd, m, v = (jax.tree.unflatten(treedef, u) for u in zip(*leaves))
        return upd, EveState(step=step, exp_avg=m, exp_avg_sq=v)


def eve(**kwargs) -> Eve:
    return Eve(**kwargs)


def dominant_parameters(grads, param_rms=None, top_n: int = 5):
    """Rank parameters by their share of the (RMS-normalized) gradient norm —
    the reference's `show_dominant_parameters` clipping diagnostic
    (reference optim.py:670-734), as a pure host-side helper the trainers
    call when extreme clipping / non-finite grads are detected.

    Args:
      grads: gradient pytree (host or device arrays).
      param_rms: optional pytree of per-leaf parameter RMS (from
        ScaledAdamState.param_rms) matching the clipping norm's weighting;
        if None, raw grad norms are ranked.
      top_n: number of entries to return.

    Returns list of (path, proportion, grad_rms) sorted by proportion.
    Leaves containing non-finite gradients sort first (proportion computed
    over the finite part; grad_rms reported as float('inf') so the log makes
    the non-finiteness explicit rather than printing nan shares).
    """
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    rms_leaves = (
        jax.tree.leaves(param_rms) if param_rms is not None else [None] * len(flat)
    )
    entries = []
    tot = 0.0
    for (path, g), rms in zip(flat, rms_leaves):
        g = np.asarray(g, np.float32)
        w = g if rms is None else g * np.asarray(rms, np.float32)
        n_bad = int((~np.isfinite(g)).sum())
        w64 = w.astype(np.float64)
        sumsq = float(np.nansum(np.where(np.isfinite(w64), w64, 0.0) ** 2))
        tot += sumsq
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", "?"))) for k in path)
        g64 = g.astype(np.float64)
        if n_bad:
            grad_rms = float("inf")
        else:
            grad_rms = float(np.sqrt((g64**2).mean())) if g.size else 0.0
        entries.append((name, sumsq, grad_rms, n_bad))
    tot = tot or 1.0
    entries.sort(key=lambda e: (-e[3], -e[1]))
    return [(n, s / tot, r) for n, s, r, _ in entries[:top_n]]


# -------------------------------------------------- per-parameter lr scaling


def make_lr_scale_tree(params, rules: Optional[dict] = None, default: float = 1.0):
    """Build a per-leaf lr multiplier pytree from path-prefix rules — the
    functional equivalent of the reference's `lr_scale` module attributes +
    get_parameter_groups_with_lrs (reference utils.py:69-138). Rules compose
    multiplicatively along the path, like nested module lr_scales.

    Example: make_lr_scale_tree(params, {"cond_encoder": 0.5,
    "estimators_0/blocks_0": 0.1}) scales every parameter under those
    prefixes; freeze a subtree with 0.0.
    """
    rules = rules or {}

    def leaf_scale(path, leaf):
        parts = [str(getattr(k, "key", getattr(k, "idx", "?"))) for k in path]
        scale = default
        for i in range(1, len(parts) + 1):
            prefix = "/".join(parts[:i])
            if prefix in rules:
                scale *= rules[prefix]
        return scale

    return jax.tree_util.tree_map_with_path(leaf_scale, params)


def parse_lr_scale_rules(
    lr_scale_rules: Optional[str] = None, freeze_modules: Optional[str] = None
) -> Optional[dict]:
    """Parse trainer flags into make_lr_scale_tree rules.

    `lr_scale_rules`: "prefix=scale,prefix=scale" (e.g.
    "cond_encoder=0.5,estimators_0/blocks_0=0.1").
    `freeze_modules`: CSV of prefixes to freeze (scale 0.0) — the
    reference's `--freeze-modules` surface (ref utils.py:100-116,
    bin/pretrain.py:795). Returns None when both are empty so callers can
    skip building the tree entirely.
    """
    rules = {}
    for item in (lr_scale_rules or "").split(","):
        item = item.strip()
        if not item:
            continue
        prefix, _, scale = item.partition("=")
        if not _:
            raise ValueError(f"bad lr-scale rule {item!r}; want prefix=scale")
        rules[prefix.strip()] = float(scale)
    for prefix in (freeze_modules or "").split(","):
        prefix = prefix.strip()
        if prefix:
            rules[prefix] = 0.0
    return rules or None
