"""Lossless torch -> JAX checkpoint conversion for Flow2GAN generators.

The reference ships `.pt` state dicts (torch Conv1d/Linear weights, channel-
first). This module maps them onto the flax param tree of
`flow2gan_tpu.models.MelAudioGenerator`:

- name mapping: `estimators.{i}` -> `estimators_{i}`, `blocks.{j}` ->
  `blocks_{j}`, `time_mlp.{0,2}` / `cond_mlp.{0,1,2}` -> `_`-joined, DDP
  `module.` prefixes stripped (reference checkpoint.py:128-141), optional
  `generator.` unwrap for GAN checkpoints (reference bin/infer.py:305-306);
- layout mapping: Conv1d (O, I, k) -> flax Conv kernel (k, I, O); 1x1 Conv and
  Linear -> Dense kernel (I, O); PReLU weight -> alpha; ChannelScale (C, 1)
  -> (C,);
- buffers (STFT windows, loss filterbanks, mel frontends) are dropped — they
  are pure functions here.

The conversion is validated end-to-end by tests/test_torch_parity.py, which
runs the actual reference model (with a stub torchaudio) against the
converted params.
"""

from __future__ import annotations

import logging
import re
from typing import Dict, Tuple

import jax
import numpy as np

# torch state-dict entries that have no parameter counterpart in the JAX tree
_SKIP_PATTERNS = (
    re.compile(r"(^|\.)loss_spec\."),
    re.compile(r"(^|\.)(fft|ifft)\.window$"),
    re.compile(r"(^|\.)mel\."),
    re.compile(r"(^|\.)mel_recon_modules\."),
    re.compile(r"(^|\.)spec_fn\."),
    re.compile(r"num_batches_tracked$"),
)

_RENAMES = [
    (re.compile(r"\bestimators\.(\d+)\."), r"estimators_\1."),
    (re.compile(r"\bblocks\.(\d+)\."), r"blocks_\1."),
    (re.compile(r"\btime_mlp\.(\d+)\."), r"time_mlp_\1."),
    (re.compile(r"\bcond_mlp\.(\d+)\."), r"cond_mlp_\1."),
    (re.compile(r"\bdiscriminators\.(\d+)\."), r"discriminators_\1."),
    (re.compile(r"\bconvs\.(\d+)\."), r"convs_\1."),
    (re.compile(r"\bband_convs\.(\d+)\.(\d+)\."), r"band_convs_\1_\2."),
    (re.compile(r"\bdiscriminator\.(\d+)\."), r"discriminator_\1."),
]


def torch_name_to_path(name: str) -> Tuple[str, ...]:
    """Map a torch state-dict name to a flax param-tree path (sans leaf fixup)."""
    for pat, rep in _RENAMES:
        name = pat.sub(rep, name)
    return tuple(name.split("."))


def _fit_leaf(
    value: np.ndarray,
    target_shape: Tuple[int, ...],
    name: str,
    target_leaf: str = "",
) -> np.ndarray:
    """Reshape/transpose a torch tensor to the flax target layout.

    CAUTION: 2-D torch Linear weights are ALWAYS (out, in) and must always be
    transposed — a square (512, 512) weight matches the target shape untouched
    but would be silently wrong. Only embeddings keep torch orientation.
    """
    v = np.asarray(value)
    if (target_leaf == "embedding" or v.ndim < 2) and v.shape == tuple(target_shape):
        return v
    if v.ndim == 3 and len(target_shape) == 3:
        # Conv1d (O, I, k) -> (k, I, O)
        t = v.transpose(2, 1, 0)
        if t.shape == tuple(target_shape):
            return t
    if v.ndim == 3 and v.shape[-1] == 1 and len(target_shape) == 2:
        # 1x1 Conv1d (O, I, 1) -> Dense (I, O)
        t = v[..., 0].T
        if t.shape == tuple(target_shape):
            return t
    if v.ndim == 2 and len(target_shape) == 2:
        # Linear (O, I) -> Dense (I, O)
        t = v.T
        if t.shape == tuple(target_shape):
            return t
    if v.ndim == 4 and len(target_shape) == 4:
        # Conv2d (O, I, kH, kW) -> flax (kH, kW, I, O)
        t = v.transpose(2, 3, 1, 0)
        if t.shape == tuple(target_shape):
            return t
    if v.size == int(np.prod(target_shape)):
        # e.g. ChannelScale (C, 1) -> (C,), scalar squeeze
        return v.reshape(target_shape)
    raise ValueError(
        f"cannot fit torch tensor {name} of shape {v.shape} "
        f"into target shape {tuple(target_shape)}"
    )


def strip_prefixes(state_dict: Dict[str, np.ndarray], unwrap_generator: bool = False):
    """Strip DDP 'module.' prefixes; optionally unwrap 'generator.' from GAN
    checkpoints (dropping discriminator/mel-recon entries)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if unwrap_generator:
            if not k.startswith("generator."):
                continue
            k = k[len("generator.") :]
        out[k] = v
    return out


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    params_template,
    strict: bool = False,
) -> Tuple[dict, list, list]:
    """Convert a torch state dict onto a flax params template.

    Args:
      state_dict: name -> numpy array (use `load_torch_file` for .pt files).
      params_template: the flax `params` tree (from model.init) giving the
        target structure/shapes.
      strict: raise if any template leaf is left unfilled.

    Returns: (params, missing_paths, unexpected_names)
    """
    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    template = {
        tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path): leaf
        for path, leaf in flat
    }
    filled = {}
    unexpected = []

    for name, value in state_dict.items():
        if any(p.search(name) for p in _SKIP_PATTERNS):
            continue
        path = torch_name_to_path(name)
        *mod_path, leaf = path
        candidates = [leaf]
        if leaf == "weight":
            candidates = ["kernel", "alpha", "embedding", "scale", "weight"]
        target_path = None
        for cand in candidates:
            p = tuple(mod_path) + (cand,)
            if p in template:
                target_path = p
                break
        if target_path is None:
            unexpected.append(name)
            continue
        filled[target_path] = _fit_leaf(
            np.asarray(value),
            template[target_path].shape,
            name,
            target_leaf=target_path[-1],
        ).astype(np.asarray(template[target_path]).dtype)

    missing = [p for p in template if p not in filled]
    if missing:
        msg = f"torch->jax conversion left {len(missing)} params unfilled: " + ", ".join(
            "/".join(map(str, p)) for p in missing[:10]
        )
        if strict:
            raise ValueError(msg)
        logging.warning(msg)
    if unexpected:
        logging.info(
            "torch->jax conversion ignored %d unexpected entries (first: %s)",
            len(unexpected),
            unexpected[:5],
        )

    def build(path, leaf):
        key = tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path)
        if key in filled:
            return jax.numpy.asarray(filled[key])
        return leaf

    params = jax.tree_util.tree_map_with_path(build, params_template)
    return params, missing, unexpected


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt checkpoint into a flat {name: numpy} dict.

    Handles both raw state dicts and {'model': state_dict} containers
    (reference save_averaged_model / save_checkpoint formats).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().to(torch.float32).numpy() if v.is_floating_point() else v.numpy()
    return out
