"""Numeric sanitizers: inf/NaN detection for losses, grads, and params.

JAX equivalent of /root/reference/flow2gan/hooks.py (module fwd/bwd hooks
warning on non-finite sums): here a jit-compatible summary pytree of
finite-ness flags, checked host-side each step when `--inf-check` is on or
auto-enabled after instability (reference bin/pretrain.py:493-497).
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp


def finite_flags(tree) -> Dict[str, jnp.ndarray]:
    """Per-top-level-key all-finite flags plus a global one. Cheap enough to
    fuse into the train step; returns small bool scalars."""
    flags = {}
    if isinstance(tree, dict):
        for k, sub in tree.items():
            leaves = jax.tree.leaves(sub)
            if leaves:
                flags[str(k)] = jnp.all(
                    jnp.stack([jnp.isfinite(x).all() for x in leaves])
                )
    leaves = jax.tree.leaves(tree)
    flags["__all__"] = jnp.all(jnp.stack([jnp.isfinite(x).all() for x in leaves]))
    return flags


def check_finite(flags: Dict, what: str) -> bool:
    """Host-side check of `finite_flags` output; warns like the reference's
    inf-check hooks. Returns True if everything is finite."""
    ok = bool(flags["__all__"])
    if not ok:
        for k, v in flags.items():
            if k != "__all__" and not bool(v):
                logging.warning(f"The sum of {what}.{k} is not finite")
    return ok


class NonfiniteLossGuard:
    """Shared trainer policy for non-finite losses (used by pretrain and
    finetune): if ScaledAdam zeroed the gradients (clip_scale == 0) the
    params are untouched and training continues (warn + one bad-model dump);
    if the grads were applied, or the streak persists, abort with the
    actionable error. Replaces the reference's fp16 grad-scale watchdog
    (bin/pretrain.py:489-515)."""

    def __init__(self, max_streak: int = 25):
        self.max_streak = max_streak
        self.streak = 0
        self.dumped = False

    def check(self, loss_val: float, clip_scale: float, batch_idx: int,
              save_bad_model, params_tree=None, intermediates_fn=None) -> None:
        """`intermediates_fn`: optional zero-arg callable returning the
        'intermediates' collection of a capture_intermediates forward on the
        offending batch — used to name the module where the inf was BORN
        (reference fwd-hook localization, hooks.py:27-96), not just which
        param/grad it landed in."""
        import numpy as np

        from flow2gan_tpu.training.err import raise_nonfinite_loss_error

        if np.isfinite(loss_val):
            self.streak = 0
            return
        self.streak += 1
        logging.warning(
            f"Non-finite loss at batch {batch_idx} (streak {self.streak}, "
            f"clip_scale {clip_scale})"
        )
        if not self.dumped:
            save_bad_model("-first-nonfinite")
            self.dumped = True
        if params_tree is not None:
            bad = find_nonfinite_leaves(params_tree)
            if bad:
                logging.warning(f"Non-finite params at: {bad}")
        if intermediates_fn is not None:
            try:
                for name in find_nonfinite_module_outputs(intermediates_fn()):
                    logging.warning(f"The output of module {name} is not finite")
            except Exception as e:  # diagnostics must not mask the error path
                logging.warning(f"inf-check forward replay failed: {e}")
        # clip_scale == 0 -> optimizer provably zeroed the grads; otherwise
        # the update was applied with non-finite values: abort immediately
        if clip_scale != 0.0 or self.streak >= self.max_streak:
            save_bad_model("")
            raise_nonfinite_loss_error(batch_idx)


def find_nonfinite_leaves(tree, limit: int = 10):
    """Detailed host-side scan: names of non-finite leaves (debug aid)."""
    import numpy as np

    bad = []
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if not np.isfinite(np.asarray(leaf)).all():
            bad.append("/".join(str(getattr(k, "key", "?")) for k in path))
            if len(bad) >= limit:
                break
    return bad


def find_nonfinite_module_outputs(intermediates, limit: int = 20):
    """Scan a flax 'intermediates' collection (capture_intermediates=True)
    for module outputs containing inf/NaN (the reference warns per-module via
    forward hooks, hooks.py:27-63).

    tree_flatten traverses dict keys alphabetically, NOT in forward-execution
    order, so ordering alone cannot identify the birth site. Instead this
    returns the DEEPEST non-finite modules first: a module none of whose
    captured submodule outputs are non-finite is a birth site (up to capture
    granularity); enclosing modules that merely propagate a descendant's inf
    are listed after, for context."""
    import numpy as np

    import re

    bad_paths = []
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    for path, leaf in flat:
        if not hasattr(leaf, "shape"):
            continue
        if not np.isfinite(np.asarray(leaf)).all():
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", "?"))) for k in path
            )
            # strip ANY call-index suffix (a module invoked per Euler step
            # captures __call__/0, __call__/1, ...), collapsing all calls of
            # one module to its scope so the descendant check below works
            name = re.sub(r"/__call__(/\d+)?$", "", name)
            if name not in bad_paths:
                bad_paths.append(name)
    # birth-site candidates: non-finite modules with no non-finite descendant.
    # Partition over the FULL set before truncating — limiting during
    # collection (alphabetical flatten order) could drop the true birth site
    # and promote downstream propagators to "leaf" status.
    def has_bad_descendant(p):
        return any(q != p and q.startswith(p + "/") for q in bad_paths)

    leaves = [p for p in bad_paths if not has_bad_descendant(p)]
    propagated = [p for p in bad_paths if has_bad_descendant(p)]
    return (leaves + propagated)[:limit]
