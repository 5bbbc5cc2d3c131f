"""Actionable error messages (reference /root/reference/flow2gan/err.py)."""

import logging
import time


def call_with_compile_retry(step_fn, *args, retries=2, wait_s=60.0):
    """Run a jitted train step, retrying when the remote AOT compile helper
    transiently kills a compile.

    On remotely-tunneled TPU runtimes, XLA compilation goes through a
    helper process that can be OOM-killed under host memory pressure; the
    client then sees a JaxRuntimeError whose message names the
    ``remote_compile`` endpoint with an HTTP 5xx / SIGKILL detail (observed:
    a GAN d_step recompile killed at batch 2, costing a whole drive stage).
    Such failures are compile-phase, so the step's donated input buffers
    were never consumed and retrying with the same arguments is safe. Any
    other exception — and a persistent helper wedge, once retries are
    exhausted — propagates unchanged, keeping the fail-closed contract.
    """
    attempt = 0
    while True:
        try:
            return step_fn(*args)
        except Exception as e:  # noqa: BLE001 — filtered by message below
            msg = str(e)
            transient = "remote_compile" in msg and (
                "SIGKILL" in msg or "HTTP 5" in msg
            )
            if not transient or attempt >= retries:
                raise
            attempt += 1
            logging.warning(
                "transient remote-compile failure (retry %d/%d in %.0fs): %s",
                attempt, retries, wait_s, msg.splitlines()[0],
            )
            time.sleep(wait_s)


def raise_nonfinite_loss_error(batch_idx: int):
    """TPU-native analogue of raise_grad_scale_is_too_small_error
    (reference err.py:19-48): on TPU there is no AMP grad scaler, so the
    instability signal is a non-finite loss/grad instead."""
    raise RuntimeError(
        f"""
    The training loss or gradients became non-finite at batch {batch_idx}.
    This usually means the model diverged. Things to try:
    - Reduce --base-lr (the ScaledAdam default 0.035 assumes the reference
      batch size; halve it and resume from the last good checkpoint).
    - Enable --inf-check to locate the first non-finite module output.
    - Inspect the bad-model checkpoint that was just saved (bad-model*.ckpt)
      with --print-diagnostics to find unusually large activations.
    """
    )
