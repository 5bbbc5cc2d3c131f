"""Actionable error messages (reference /root/reference/flow2gan/err.py)."""


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
