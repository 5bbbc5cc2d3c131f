"""Jitted training steps (FM pretraining; GAN steps live in models/gan.py
stage). One step = forward + backward + ScaledAdam update + metrics, compiled
as a single XLA program over the mesh.

Replaces the reference per-batch torch loop body
(/root/reference/flow2gan/bin/pretrain.py:341-467): AMP/GradScaler machinery
is dropped (bf16/f32 on TPU needs no loss scaling); DDP all-reduce is implicit
in jit-over-mesh (batch sharded on 'data', params replicated).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from flow2gan_tpu.training.optim import ScaledAdam


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_idx: jnp.ndarray  # int32, global batches since start of training


def init_train_state(params, optimizer: ScaledAdam) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        batch_idx=jnp.zeros((), jnp.int32),
    )


def make_fm_train_step(
    model,
    optimizer: ScaledAdam,
    lr_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mel_fn: Optional[Callable] = None,
    lr_scale=None,
    donate: bool = True,
):
    """Build the jitted FM train step.

    Args:
      model: MelAudioGenerator (flax module).
      optimizer: ScaledAdam instance.
      lr_fn: batch_idx -> learning rate (e.g. eden2_lr partial).
      mel_fn: optional audio -> cond frontend computed on device inside the
        step (the reference computes mels on device per batch,
        bin/pretrain.py:350); if None the batch must contain 'cond'.

    The returned step takes (state, batch, rng) where batch is a dict with
    'audio' (B, L), 'audio_lens' (B,), and optionally 'cond'. Returns
    (new_state, metrics).
    """

    def loss_fn(params, batch, rng):
        cond = batch.get("cond")
        if cond is None:
            assert mel_fn is not None
            cond = mel_fn(batch["audio"])
        rngs = {
            "noise": jax.random.fold_in(rng, 0),
            "gate": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
        }
        loss = model.apply(
            {"params": params},
            cond,
            batch["audio"],
            batch["audio_lens"],
            train=True,
            rngs=rngs,
        )
        return loss

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.batch_idx)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        lr = lr_fn(state.batch_idx)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params, lr=lr, lr_scale=lr_scale
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, batch_idx=state.batch_idx + 1
        )
        metrics = {
            "loss": loss,
            "lr": lr,
            "clip_scale": opt_state.clip_scale,
            "samples": jnp.asarray(batch["audio"].shape[0], jnp.float32),
        }
        return new_state, metrics

    return train_step


def make_fm_grad_fn(model, mel_fn: Optional[Callable] = None):
    """Jitted grad-only FM loss for debugging: lets the trainers rank
    parameters by gradient-norm share (`optim.dominant_parameters`) when the
    optimizer hard-clips or hits non-finite grads — the reference's
    `show_dominant_parameters` path (reference optim.py:608,670-734)."""

    def loss_fn(params, batch, rng):
        cond = batch.get("cond")
        if cond is None:
            assert mel_fn is not None
            cond = mel_fn(batch["audio"])
        rngs = {
            "noise": jax.random.fold_in(rng, 0),
            "gate": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
        }
        return model.apply(
            {"params": params},
            cond,
            batch["audio"],
            batch["audio_lens"],
            train=True,
            rngs=rngs,
        )

    return jax.jit(jax.grad(loss_fn))


def make_fm_eval_step(model, mel_fn: Optional[Callable] = None):
    """Validation loss (no param update, eval-mode stochastics still sample
    t/x0 like the reference's compute_validation_loss)."""

    @jax.jit
    def eval_step(params, batch, rng):
        cond = batch.get("cond")
        if cond is None:
            assert mel_fn is not None
            cond = mel_fn(batch["audio"])
        loss = model.apply(
            {"params": params},
            cond,
            batch["audio"],
            batch["audio_lens"],
            train=False,
            rngs={"noise": rng},
        )
        return loss

    return eval_step
