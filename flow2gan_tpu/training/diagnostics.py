"""Activation/parameter diagnostics — the JAX equivalent of the reference's
hook-based TensorDiagnostic subsystem (/root/reference/flow2gan/diagnostics.py).

Instead of forward/backward hooks, we use flax's `capture_intermediates` to
tap every module output in one pass, and accumulate per-dimension statistics
(abs mean/max, rms, positive fraction, percentiles) over a few batches.
Activated by `--print-diagnostics` in the trainers: runs 5 batches, prints
the tables, exits (reference bin/pretrain.py:474-475,856-858).
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


class TensorStats:
    """Accumulated stats for one tagged tensor (reference TensorDiagnostic,
    diagnostics.py:120-334, simplified to the actionable subset)."""

    def __init__(self):
        self.count = 0
        self.sum_abs = 0.0
        self.sum_sq = 0.0
        self.max_abs = 0.0
        self.pos = 0.0
        self.n = 0
        # per-channel (last-dim) rms accumulators when the tensor has channels
        self.chan_sq = None
        self.chan_n = 0

    def update(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        self.count += 1
        self.sum_abs += float(np.abs(x).sum())
        self.sum_sq += float((x.astype(np.float64) ** 2).sum())
        self.max_abs = max(self.max_abs, float(np.abs(x).max(initial=0.0)))
        self.pos += float((x > 0).sum())
        self.n += x.size
        if x.ndim >= 2 and x.shape[-1] <= 2048:
            sq = (x.astype(np.float64) ** 2).reshape(-1, x.shape[-1]).sum(axis=0)
            if self.chan_sq is None:
                self.chan_sq = sq
            elif self.chan_sq.shape == sq.shape:
                self.chan_sq += sq
            self.chan_n += x.size // x.shape[-1]

    def summary(self) -> str:
        if self.n == 0:
            return "empty"
        mean_abs = self.sum_abs / self.n
        rms = (self.sum_sq / self.n) ** 0.5
        pos = self.pos / self.n
        s = f"abs-mean={mean_abs:.3g} rms={rms:.3g} max-abs={self.max_abs:.3g} pos-frac={pos:.2f}"
        if self.chan_sq is not None and self.chan_n > 0:
            crms = np.sqrt(self.chan_sq / self.chan_n)
            pct = np.percentile(crms, [0, 25, 50, 75, 100])
            s += (
                " chan-rms[p0,p25,p50,p75,p100]=["
                + ",".join(f"{v:.3g}" for v in pct)
                + "]"
            )
        return s


class DiagnosticsCollector:
    """Collects module-output and parameter stats over several batches."""

    def __init__(self):
        self.stats: Dict[str, TensorStats] = {}

    def _tag(self, name: str, value):
        for leaf in jax.tree.leaves(value):
            if not hasattr(leaf, "shape"):
                continue
            self.stats.setdefault(name, TensorStats()).update(np.asarray(leaf))

    def collect_intermediates(self, intermediates: Dict[str, Any], prefix=""):
        """Feed the `intermediates` collection from
        model.apply(..., capture_intermediates=True)."""
        flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
        for path, leaf in flat:
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", "?"))) for k in path
            )
            if hasattr(leaf, "shape"):
                self.stats.setdefault(prefix + name, TensorStats()).update(
                    np.asarray(leaf)
                )

    def collect_params(self, params, prefix="param/"):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = prefix + "/".join(
                str(getattr(k, "key", getattr(k, "idx", "?"))) for k in path
            )
            self.stats.setdefault(name, TensorStats()).update(np.asarray(leaf))

    def print_diagnostics(self, log=logging.info):
        for name in sorted(self.stats):
            log(f"Diagnostics [{name}]: {self.stats[name].summary()}")


class ScalarDiagnostic:
    """Activation-value vs gradient histogram for one nonlinearity — the JAX
    equivalent of the reference's ScalarDiagnostic backward-hook histograms
    (reference diagnostics.py:337-511, 20 bins). The range is fixed from the
    first batch's abs-max; later batches accumulate into the same bins."""

    N_BINS = 20

    def __init__(self):
        self.limit = None
        self.counts = np.zeros(self.N_BINS, np.int64)
        self.grad_abs = np.zeros(self.N_BINS, np.float64)
        self.grad_sum = np.zeros(self.N_BINS, np.float64)

    def update(self, value: np.ndarray, grad: np.ndarray):
        v = np.asarray(value, np.float32).ravel()
        g = np.asarray(grad, np.float32).ravel()
        if self.limit is None:
            self.limit = float(np.abs(v).max(initial=0.0)) or 1.0
        idx = np.clip(
            ((v / self.limit) * 0.5 + 0.5) * self.N_BINS, 0, self.N_BINS - 1
        ).astype(np.int64)
        np.add.at(self.counts, idx, 1)
        np.add.at(self.grad_abs, idx, np.abs(g).astype(np.float64))
        np.add.at(self.grad_sum, idx, g.astype(np.float64))

    def summary(self) -> str:
        if self.limit is None or self.counts.sum() == 0:
            return "empty"
        tot = self.counts.sum()
        occ = self.counts / tot
        mean_abs_grad = self.grad_abs / np.maximum(self.counts, 1)
        top = np.argsort(-occ)[:4]
        edges = np.linspace(-self.limit, self.limit, self.N_BINS + 1)
        cells = ", ".join(
            f"[{edges[i]:.2g},{edges[i+1]:.2g}): occ={occ[i]:.2f} "
            f"|g|={mean_abs_grad[i]:.3g}"
            for i in sorted(top)
        )
        return f"range=±{self.limit:.3g} top-bins: {cells}"


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", "?"))) for k in path)


def collect_scalar_diagnostics(stats, intermediates, perturb_grads):
    """Pair captured nonlinearity outputs with their perturbation gradients.

    `intermediates` is the 'intermediates' collection of an apply with
    `capture_intermediates` filtered to the nonlinearity modules;
    `perturb_grads` is jax.grad of the loss w.r.t. the 'perturbations'
    collection (see models/norms.py `diagnostic_perturbations`). Both trees
    share module scopes; entries are matched on the scope prefix.
    `stats` is a dict name -> ScalarDiagnostic, updated in place."""
    values = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(intermediates)[0]:
        name = _path_str(path)
        for suffix in ("/__call__/0", "/__call__"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
                break
        if hasattr(leaf, "shape"):
            values[name] = leaf
    for path, g in jax.tree_util.tree_flatten_with_path(perturb_grads)[0]:
        name = _path_str(path)
        if name.endswith("/act"):
            name = name[: -len("/act")]
        v = values.get(name)
        if v is not None and hasattr(g, "shape") and v.shape == g.shape:
            stats.setdefault(name, ScalarDiagnostic()).update(
                np.asarray(v), np.asarray(g)
            )


def print_scalar_diagnostics(stats, log=logging.info):
    for name in sorted(stats):
        log(f"ScalarDiagnostics [{name}]: {stats[name].summary()}")
