"""Jitted GAN fine-tuning steps (stage 2).

Replaces the reference's alternating D/G torch loop
(/root/reference/flow2gan/bin/finetune.py:427-626 + models/gan.py:101-166)
with two separately-jitted steps; the D-warmup / strict alternation toggle
stays a host-level bool exactly like `params.train_disc`.

The G step differentiates through the FULL unrolled n-step Euler solve
(generator in train mode, branch dropout disabled by config); the D step
rolls the generator in eval mode under stop_gradient.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from flow2gan_tpu.models.gan import (
    discriminator_loss,
    feature_matching_loss,
    generator_loss,
    mel_recon_loss,
)
from flow2gan_tpu.training.optim import ScaledAdam


class GANLossScales(NamedTuple):
    """Defaults = reference finetune flags (bin/finetune.py:296-343)."""

    disc_mp: float = 1.0
    disc_mr: float = 0.1
    gen_mp: float = 1.0
    gen_mr: float = 0.1
    fmap_mp: float = 1.0
    fmap_mr: float = 0.1
    mel_recon: float = 45.0


class GANTrainState(NamedTuple):
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    batch_idx: jnp.ndarray  # int32, counts all batches (D + G)


def init_gan_train_state(
    params_g, params_d, optimizer_g: ScaledAdam, optimizer_d: ScaledAdam
) -> GANTrainState:
    return GANTrainState(
        params_g=params_g,
        params_d=params_d,
        opt_g=optimizer_g.init(params_g),
        opt_d=optimizer_d.init(params_d),
        batch_idx=jnp.zeros((), jnp.int32),
    )


def _rollout(generator, params_g, cond, audio_lens, n_timesteps, rng, train,
             length, extra_vars=None, capture_filter=None, scan_solve=False,
             remat_scan=False):
    """Returns (fake, intermediates). `extra_vars`: extra generator
    collections (the diagnostics 'perturbations' tap); `capture_filter`:
    flax capture_intermediates filter (the diagnostics act-vs-grad pass).
    Both are None on the jitted hot path; intermediates is then None.

    `scan_solve=True` rolls the n-step Euler solve into one nn.scan so the
    differentiated G-step program holds a single model copy (the unrolled
    2/4-step backward graphs are 30-60 MB of MLIR and can OOM the AOT
    compiler). Forced off under the diagnostics taps, which need per-step
    (unstacked) intermediates."""
    if extra_vars or capture_filter is not None:
        scan_solve = False
    rngs = {"noise": jax.random.fold_in(rng, 0)}
    if train:
        rngs["gate"] = jax.random.fold_in(rng, 1)
        rngs["dropout"] = jax.random.fold_in(rng, 2)
    variables = {"params": params_g}
    if extra_vars:
        variables.update(extra_vars)
    kwargs = dict(
        audio_lens=audio_lens,
        n_timesteps=n_timesteps,
        clamp_pred=False,
        train=train,
        method="infer",
        rngs=rngs,
        scan_solve=scan_solve,
        remat_scan=remat_scan and scan_solve,
    )
    inter = None
    if capture_filter is not None:
        fake, mut = generator.apply(
            variables, cond,
            capture_intermediates=capture_filter,
            mutable=["intermediates"],
            **kwargs,
        )
        inter = mut["intermediates"]
    else:
        fake = generator.apply(variables, cond, **kwargs)
    # the generator's static output length is frames * hop >= padded audio
    # length; match the real batch (reference uses audio_lens.max(),
    # gan infer path generator.py:352-356)
    return fake[..., :length], inter


def make_gan_loss_fns(
    generator,
    discriminators,
    mel_fn: Callable,
    mel_recon_fns,
    n_timesteps: int = 1,
    scales: GANLossScales = GANLossScales(),
    remat_rollout: bool = False,
    scan_rollout: Optional[bool] = None,
):
    """The two GAN objectives as pure functions, shared by the jitted train
    steps and the debugging surfaces (dominant-grad ranking, backward
    diagnostics). Returns (d_loss_fn, g_loss_fn), each
    (own_params, other_params, batch, rng) -> (loss, metrics).

    `scan_rollout` (default None = auto: on when n_timesteps > 1) scans the
    G-step's Euler rollout instead of unrolling it — one model copy in the
    differentiated program. The D-step rollout stays unrolled: it is
    forward-only under stop_gradient, where the unrolled form compiles fine
    and lets XLA specialize per-step constants.

    `remat_rollout` on a SCANNED rollout remats the scan body (residual
    memory ~one Euler step regardless of n_timesteps — required for the
    44.1 kHz 4-step G step at batch 16, which otherwise needs 16.1 GB of
    HBM vs the v5e's 15.75); on an unrolled rollout it wraps the whole
    rollout in jax.checkpoint."""
    if scan_rollout is None:
        scan_rollout = n_timesteps > 1

    def d_loss_fn(params_d, params_g, batch, rng):
        cond = mel_fn(batch["audio"])
        fake = jax.lax.stop_gradient(
            _rollout(
                generator, params_g, cond, batch["audio_lens"], n_timesteps, rng,
                train=False, length=batch["audio"].shape[-1],
            )[0]
        )
        (mp, mr) = discriminators.apply(
            {"params": params_d}, batch["audio"], fake
        )
        score_real_mp, score_fake_mp, _, _ = mp
        score_real_mr, score_fake_mr, _, _ = mr
        disc_loss_mp = discriminator_loss(score_real_mp, score_fake_mp)
        disc_loss_mr = discriminator_loss(score_real_mr, score_fake_mr)
        loss = scales.disc_mp * disc_loss_mp + scales.disc_mr * disc_loss_mr
        return loss, {
            "loss_d": loss,
            "disc_loss_mp": disc_loss_mp,
            "disc_loss_mr": disc_loss_mr,
        }

    def g_loss_fn(params_g, params_d, batch, rng, extra_vars_g=None,
                  capture_filter=None):
        # extra_vars_g / capture_filter: diagnostics-only hooks (the
        # 'perturbations' tap and the act-vs-grad intermediates capture);
        # both None on the jitted hot path
        cond = mel_fn(batch["audio"])

        def roll(params_g, cond):
            return _rollout(
                generator, params_g, cond, batch["audio_lens"], n_timesteps, rng,
                train=True, length=batch["audio"].shape[-1],
                extra_vars=extra_vars_g, capture_filter=capture_filter,
                scan_solve=scan_rollout,
                remat_scan=remat_rollout,
            )

        if remat_rollout and not scan_rollout:
            roll = jax.checkpoint(roll)
        fake, inter = roll(params_g, cond)
        (mp, mr) = discriminators.apply(
            {"params": params_d}, batch["audio"], fake
        )
        _, score_fake_mp, fmap_real_mp, fmap_fake_mp = mp
        _, score_fake_mr, fmap_real_mr, fmap_fake_mr = mr
        gen_loss_mp = generator_loss(score_fake_mp)
        gen_loss_mr = generator_loss(score_fake_mr)
        fm_mp = feature_matching_loss(fmap_real_mp, fmap_fake_mp)
        fm_mr = feature_matching_loss(fmap_real_mr, fmap_fake_mr)
        mel_loss = mel_recon_loss(batch["audio"], fake, mel_recon_fns)
        loss = (
            scales.gen_mp * gen_loss_mp
            + scales.gen_mr * gen_loss_mr
            + scales.fmap_mp * fm_mp
            + scales.fmap_mr * fm_mr
            + scales.mel_recon * mel_loss
        )
        metrics = {
            "loss_g": loss,
            "gen_loss_mp": gen_loss_mp,
            "gen_loss_mr": gen_loss_mr,
            "feat_map_loss_mp": fm_mp,
            "feat_map_loss_mr": fm_mr,
            "mel_recon_loss": mel_loss,
        }
        if inter is not None:
            metrics["_intermediates"] = inter
        return loss, metrics

    return d_loss_fn, g_loss_fn


def make_gan_grad_fns(
    generator,
    discriminators,
    mel_fn: Callable,
    mel_recon_fns,
    n_timesteps: int = 1,
    scales: GANLossScales = GANLossScales(),
    remat_rollout: bool = False,
):
    """Jitted grad-only D and G objectives for debugging: lets the finetune
    trainer rank parameters by gradient-norm share (`dominant_parameters`)
    when either optimizer hard-clips — the reference's
    `show_dominant_parameters` path, which finetune attaches to BOTH
    optimizers (ref bin/finetune.py:633-656). Returns (grad_d_fn, grad_g_fn),
    each (own_params, other_params, batch, rng) -> grads of own_params.

    `remat_rollout` must match the trained step's setting: the debug grad
    replay differentiates the same multi-step rollout, so on configs that
    need scan-body remat to fit HBM (44.1 kHz 4-step) an un-remattered
    replay would OOM exactly when it is asked to explain a hard-clip."""
    d_loss_fn, g_loss_fn = make_gan_loss_fns(
        generator, discriminators, mel_fn, mel_recon_fns,
        n_timesteps=n_timesteps, scales=scales, remat_rollout=remat_rollout,
    )
    grad_d = jax.jit(jax.grad(lambda pd, pg, b, r: d_loss_fn(pd, pg, b, r)[0]))
    grad_g = jax.jit(jax.grad(lambda pg, pd, b, r: g_loss_fn(pg, pd, b, r)[0]))
    return grad_d, grad_g


def make_gan_steps(
    generator,
    discriminators,
    mel_fn: Callable,
    mel_recon_fns,
    optimizer_g: ScaledAdam,
    optimizer_d: ScaledAdam,
    lr_g_fn: Callable,
    lr_d_fn: Callable,
    n_timesteps: int = 1,
    scales: GANLossScales = GANLossScales(),
    donate: bool = True,
    remat_rollout: bool = False,
    scan_rollout: Optional[bool] = None,
    lr_scale_g=None,
):
    """Returns (d_step, g_step), each (state, batch, rng) -> (state, metrics).

    `lr_scale_g`: optional per-leaf lr multiplier pytree for the generator
    (make_lr_scale_tree) — the reference's freeze_modules / lr_scale surface
    (ref utils.py:69-138) applied to stage 2.

    `remat_rollout=True` rematerializes the generator rollout in the G step
    (jax.checkpoint) — trades recompute for memory on the unrolled 4-step
    Euler graph (the reference's deep-autograd-graph problem, SURVEY.md §7).

    `batch`: {'audio': (B, L), 'audio_lens': (B,)}. The D/G alternation
    (gen_start_batch_idx warmup then strict toggle) is the caller's loop.

    Scheduler coupling matches the reference: D and G each have their own
    Eden2 on their own step count; since they strictly alternate after warmup,
    each scheduler is driven by the number of updates IT has taken —
    we derive it from state.opt_{g,d}.step (ScaledAdam's own step counter).
    """
    d_loss_fn, g_loss_fn = make_gan_loss_fns(
        generator, discriminators, mel_fn, mel_recon_fns,
        n_timesteps=n_timesteps, scales=scales, remat_rollout=remat_rollout,
        scan_rollout=scan_rollout,
    )

    donate_args = (0,) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def d_step(state: GANTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.batch_idx)
        (loss, metrics), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d, state.params_g, batch, rng
        )
        lr = lr_d_fn(state.opt_d.step)
        updates, opt_d = optimizer_d.update(grads, state.opt_d, state.params_d, lr=lr)
        params_d = optax.apply_updates(state.params_d, updates)
        metrics["lr_d"] = lr
        metrics["samples"] = jnp.asarray(batch["audio"].shape[0], jnp.float32)
        return (
            state._replace(
                params_d=params_d, opt_d=opt_d, batch_idx=state.batch_idx + 1
            ),
            metrics,
        )

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def g_step(state: GANTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.batch_idx)
        (loss, metrics), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g, state.params_d, batch, rng
        )
        lr = lr_g_fn(state.opt_g.step)
        updates, opt_g = optimizer_g.update(
            grads, state.opt_g, state.params_g, lr=lr, lr_scale=lr_scale_g
        )
        params_g = optax.apply_updates(state.params_g, updates)
        metrics["lr_g"] = lr
        metrics["samples"] = jnp.asarray(batch["audio"].shape[0], jnp.float32)
        return (
            state._replace(
                params_g=params_g, opt_g=opt_g, batch_idx=state.batch_idx + 1
            ),
            metrics,
        )

    def eval_step_impl(params_g, params_d, batch, rng):
        # eval-mode rollout (train=False): no mel-noise aug / branch dropout,
        # matching the reference's model.eval() validation
        cond = mel_fn(batch["audio"])
        fake, _ = _rollout(
            generator, params_g, cond, batch["audio_lens"], n_timesteps, rng,
            train=False, length=batch["audio"].shape[-1],
        )
        (mp, mr) = discriminators.apply({"params": params_d}, batch["audio"], fake)
        _, score_fake_mp, fmap_real_mp, fmap_fake_mp = mp
        _, score_fake_mr, fmap_real_mr, fmap_fake_mr = mr
        gen_loss_mp = generator_loss(score_fake_mp)
        gen_loss_mr = generator_loss(score_fake_mr)
        fm_mp = feature_matching_loss(fmap_real_mp, fmap_fake_mp)
        fm_mr = feature_matching_loss(fmap_real_mr, fmap_fake_mr)
        mel_loss = mel_recon_loss(batch["audio"], fake, mel_recon_fns)
        loss = (
            scales.gen_mp * gen_loss_mp
            + scales.gen_mr * gen_loss_mr
            + scales.fmap_mp * fm_mp
            + scales.fmap_mr * fm_mr
            + scales.mel_recon * mel_loss
        )
        return {
            "loss_g": loss,
            "gen_loss_mp": gen_loss_mp,
            "gen_loss_mr": gen_loss_mr,
            "feat_map_loss_mp": fm_mp,
            "feat_map_loss_mr": fm_mr,
            "mel_recon_loss": mel_loss,
        }

    eval_step = jax.jit(eval_step_impl)

    return d_step, g_step, eval_step
