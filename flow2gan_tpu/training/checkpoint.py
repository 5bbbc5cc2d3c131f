"""Checkpointing: save/load/resume + the icefall averaging machinery.

Functional re-design of /root/reference/flow2gan/checkpoint.py for JAX:
checkpoints are msgpack-serialized pytrees (flax.serialization) holding
numpy arrays — model params, the float64 running-average ("model_avg",
reference checkpoint.py:378-409; f64 lives host-side, TPUs never see it),
optimizer/scheduler state and user params.

Capabilities preserved:
- epoch / global-batch checkpoints with topk retention
  (find/remove_checkpoints, reference checkpoint.py:277-375);
- Polyak running average `avg = cur*(period/step) + avg*(1-period/step)`;
- EMA average;
- plain N-checkpoint averaging;
- **windowed averaging by differencing two running averages**
  (reference checkpoint.py:442-501) with the same overflow-safe rescaling —
  this is how the released checkpoints were produced (avg-40 FM, avg-4 GAN).
"""

from __future__ import annotations

import glob
import logging
import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import numpy as np
from flax import serialization

Pathlike = Union[str, Path]


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    filename: Pathlike,
    params: Any,
    model_avg: Any = None,
    optimizer_state: Any = None,
    scheduler_state: Any = None,
    train_params: Optional[Dict] = None,
    sampler_state: Any = None,
    extra: Optional[Dict] = None,
) -> None:
    """Save a training checkpoint (reference save_checkpoint,
    checkpoint.py:40-108). Caller is responsible for only saving on process 0.
    """
    logging.info(f"Saving checkpoint to {filename}")
    ckpt = {
        "model": _to_numpy_tree(params),
        "model_avg": _to_numpy_tree(model_avg) if model_avg is not None else None,
        "optimizer": _to_numpy_tree(optimizer_state)
        if optimizer_state is not None
        else None,
        "scheduler": scheduler_state,
        "sampler": sampler_state,
    }
    if extra:
        ckpt.update(extra)
    if train_params:
        for k, v in train_params.items():
            assert k not in ckpt, k
            ckpt[k] = v
    # NamedTuple states (e.g. ScaledAdamState) -> plain dicts for msgpack
    ckpt = serialization.to_state_dict(ckpt)
    data = serialization.msgpack_serialize(ckpt)
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    tmp = str(filename) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, str(filename))


def load_checkpoint(filename: Pathlike) -> Dict:
    """Load a checkpoint into a raw dict of numpy trees."""
    with open(str(filename), "rb") as f:
        data = f.read()
    return serialization.msgpack_restore(data)


def restore_params(template, loaded) -> Any:
    """Shape a loaded (possibly dict-of-dicts) tree onto a params template."""
    return serialization.from_state_dict(template, loaded)


# ------------------------------------------------------------------ averaging


def average_state_trees(tree1, tree2, weight_1: float, weight_2: float,
                        scaling_factor: float = 1.0):
    """(tree1 * w1 + tree2 * w2) * scaling_factor, in float64.

    Reference average_state_dict (checkpoint.py:504-531); JAX params never
    alias so the data_ptr dedup is unnecessary.
    """
    return jax.tree.map(
        lambda a, b: (
            (np.asarray(a, np.float64) * weight_1 + np.asarray(b, np.float64) * weight_2)
            * scaling_factor
        ),
        tree1,
        tree2,
    )


def update_averaged_model(
    model_avg, model_cur, average_period: int, batch_idx_train: int
):
    """Running Polyak average in float64 (reference checkpoint.py:378-409):
    avg = cur * (period/step) + avg * (1 - period/step).
    """
    weight_cur = average_period / batch_idx_train
    return average_state_trees(model_avg, model_cur, 1.0 - weight_cur, weight_cur)


def update_ema_model(model_ema, model_cur, ema_decay: float):
    """EMA: ema*decay + cur*(1-decay) (reference checkpoint.py:412-439)."""
    return average_state_trees(model_ema, model_cur, ema_decay, 1.0 - ema_decay)


def average_checkpoints(filenames: List[Pathlike]) -> Any:
    """Plain mean of the 'model' trees of N checkpoints
    (reference checkpoint.py:171-213)."""
    n = len(filenames)
    assert n >= 1
    avg = jax.tree.map(
        lambda x: np.asarray(x, np.float64), load_checkpoint(filenames[0])["model"]
    )
    for fname in filenames[1:]:
        cur = load_checkpoint(fname)["model"]
        avg = jax.tree.map(lambda a, b: a + np.asarray(b, np.float64), avg, cur)
    return jax.tree.map(lambda a: (a / n).astype(np.float32), avg)


def average_checkpoints_with_averaged_model(
    filename_start: Pathlike, filename_end: Pathlike
) -> Any:
    """Average over (start, end] by differencing the two checkpoints' running
    averages, with overflow-safe rescaling (reference checkpoint.py:442-501):

      avg = (model_end + model_start * (w_start / w_end)) * w_end,
      w_end = end / (end - start), w_start = 1 - w_end.
    """
    start = load_checkpoint(filename_start)
    end = load_checkpoint(filename_end)
    b_start = int(start["batch_idx_train"])
    b_end = int(end["batch_idx_train"])
    interval = b_end - b_start
    assert interval > 0, (b_start, b_end)
    weight_end = b_end / interval
    weight_start = 1.0 - weight_end
    avg = average_state_trees(
        end["model_avg"],
        start["model_avg"],
        weight_1=1.0,
        weight_2=weight_start / weight_end,
        scaling_factor=weight_end,
    )
    return jax.tree.map(lambda a: a.astype(np.float32), avg)


# ------------------------------------------------------- filename management


def save_checkpoint_with_global_batch_idx(
    out_dir: Pathlike, global_batch_idx: int, **kwargs
) -> Path:
    """Save 'checkpoint-{global_batch_idx}.ckpt' (reference checkpoint.py:216-274)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    filename = out_dir / f"checkpoint-{global_batch_idx}.ckpt"
    save_checkpoint(filename=filename, **kwargs)
    return filename


def find_checkpoints(out_dir: Pathlike, iteration: int = 0) -> List[str]:
    """List 'checkpoint-xxx.ckpt' sorted by iteration, newest first
    (reference checkpoint.py:277-318). iteration >= 0: all; < 0: only those
    with iteration >= -iteration."""
    checkpoints = list(glob.glob(f"{out_dir}/checkpoint-[0-9]*.ckpt"))
    pattern = re.compile(r"checkpoint-([0-9]+)\.ckpt")
    iter_checkpoints = []
    for c in checkpoints:
        result = pattern.search(c)
        if not result:
            logging.warning(f"Invalid checkpoint filename {c}")
            continue
        iter_checkpoints.append((int(result.group(1)), c))
    iter_checkpoints = sorted(iter_checkpoints, reverse=True, key=lambda x: x[0])
    if iteration >= 0:
        ans = [ic[1] for ic in iter_checkpoints]
    else:
        ans = [ic[1] for ic in iter_checkpoints if ic[0] >= -iteration]
    return ans


def remove_checkpoints(out_dir: Pathlike, topk: int) -> None:
    """Keep only the topk newest batch checkpoints (reference checkpoint.py:346-375)."""
    assert topk >= 1, topk
    checkpoints = find_checkpoints(out_dir)
    if len(checkpoints) <= topk:
        return
    for c in checkpoints[topk:]:
        os.remove(c)
