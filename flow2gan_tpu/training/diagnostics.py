"""Activation/parameter diagnostics — the JAX equivalent of the reference's
hook-based TensorDiagnostic subsystem (/root/reference/flow2gan/diagnostics.py).

Instead of forward/backward hooks, we use flax's `capture_intermediates` to
tap every module output in one pass, and accumulate statistics over a few
batches. Activated by `--print-diagnostics` in the trainers: runs 5 batches,
prints the tables, exits (reference bin/pretrain.py:474-475,856-858).

Depth matches the reference's per-dimension analysis (diagnostics.py:46-334):
for every dimension of every tagged tensor we accumulate abs / positive /
value / rms / max / min element stats, an 11-point percentile summary of the
per-position rms ("rms-sort"), a derived centered-rms ("stddev"), and — for
dimensions of size <= 512 — the Gram matrix, whose eigen-spectrum is printed
at report time (the Zipformer-lineage collapse/explosion debugging signal).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import numpy as np

MAX_EIG_DIM = 512  # reference TensorDiagnosticOptions.max_eig_dim


def _dim_is_summarized(size: int) -> bool:
    # reference diagnostics.py:42-44: small dims print raw values
    return size > 10 and size != 31


def _percentile_str(values: np.ndarray, num: int = 10) -> str:
    """11 order-statistic points like the reference (diagnostics.py:300-306)."""
    v = np.sort(values.ravel())
    n = v.size
    pts = [v[(i * (n - 1)) // num] for i in range(num + 1)]
    return "[" + " ".join("%.2g" % p for p in pts) + "]"


class DimStats:
    """Accumulators for one (tensor, dim) pair."""

    def __init__(self, size: int, with_eigs: bool):
        self.size = size
        self.count = 0.0  # items summed per element (abs/value/rms/positive)
        self.sum_abs = np.zeros(size, np.float64)
        self.sum_val = np.zeros(size, np.float64)
        self.sum_sq = np.zeros(size, np.float64)
        self.sum_pos = np.zeros(size, np.float64)
        self.max_v = np.full(size, -np.inf, np.float64)
        self.min_v = np.full(size, np.inf, np.float64)
        self.rms_sort = np.zeros(11, np.float64)
        self.rms_sort_count = 0
        self.gram: Optional[np.ndarray] = (
            np.zeros((size, size), np.float64) if with_eigs else None
        )
        self.variable = False  # tensor shape changed on this dim across batches

    def update(self, x: np.ndarray, dim: int) -> None:
        if x.shape[dim] != self.size:
            # e.g. a ragged time dim across batches; keep what we have
            # (the reference keeps per-size buckets and disables eigs,
            # diagnostics.py:218-224 — our trainers use fixed crops)
            self.variable = True
            return
        m = np.moveaxis(x, dim, -1).reshape(-1, self.size).astype(np.float32)
        self.count += m.shape[0]
        self.sum_abs += np.abs(m).sum(axis=0, dtype=np.float64)
        self.sum_val += m.sum(axis=0, dtype=np.float64)
        self.sum_sq += (m.astype(np.float64) ** 2).sum(axis=0)
        self.sum_pos += (m > 0).sum(axis=0).astype(np.float64)
        self.max_v = np.maximum(self.max_v, m.max(axis=0))
        self.min_v = np.minimum(self.min_v, m.min(axis=0))
        # rms over THIS dim per position, 11 order statistics, averaged
        # across updates (reference "rms-sort", diagnostics.py:75-81)
        rms = np.sqrt((m.astype(np.float64) ** 2).mean(axis=1))
        rms.sort()
        n = rms.size
        idx = np.minimum(np.arange(11) * n // 10, n - 1)
        self.rms_sort += rms[idx]
        self.rms_sort_count += 1
        if self.gram is not None:
            self.gram += (m.T @ m).astype(np.float64)

    def report_lines(self, name: str, dim: int) -> List[str]:
        if self.count == 0:
            return []
        cnt = self.count
        kinds = {
            "abs": self.sum_abs / cnt,
            "positive": self.sum_pos / cnt,
            "value": self.sum_val / cnt,
            "rms": np.sqrt(self.sum_sq / cnt),
            # centered rms: E[x^2] - E[x]^2 (reference derives "stddev" from
            # the rms and value accumulators, diagnostics.py:232-246)
            "stddev": np.sqrt(
                np.maximum(self.sum_sq / cnt - (self.sum_val / cnt) ** 2, 0.0)
            ),
            "max": self.max_v,
            "min": self.min_v,
        }
        if self.gram is not None:
            try:
                eigs = np.linalg.eigvalsh(self.gram / cnt)
                kinds["eigs"] = np.sqrt(np.abs(eigs))  # magnitude scale
            except np.linalg.LinAlgError:
                pass
        lines = []
        suffix = " (size varied across batches)" if self.variable else ""
        for kind, stats in kinds.items():
            if _dim_is_summarized(stats.size):
                body = f"percentiles: {_percentile_str(stats)}"
            else:
                body = "[" + " ".join("%.2g" % v for v in stats) + "]"
            if kind in ("value", "rms", "stddev", "eigs"):
                body += f", norm={np.sqrt((stats ** 2).sum()):.2g}"
            body += f", mean={stats.mean():.3g}, rms={np.sqrt((stats ** 2).mean()):.3g}"
            lines.append(f"module={name}, dim={dim}, size={self.size}, {kind} {body}")
        if self.rms_sort_count:
            rs = self.rms_sort / self.rms_sort_count
            lines.append(
                f"module={name}, dim={dim}, size={self.size}, rms-sort "
                "[" + " ".join("%.2g" % v for v in rs) + "]"
                f", mean={rs.mean():.3g}, rms={np.sqrt((rs ** 2).mean()):.3g}"
            )
        return lines


class TensorStats:
    """Accumulated stats for one tagged tensor: a cheap whole-tensor summary
    plus per-dimension deep stats (reference TensorDiagnostic,
    diagnostics.py:120-334)."""

    def __init__(self, max_eig_dim: int = MAX_EIG_DIM):
        self.max_eig_dim = max_eig_dim
        self.count = 0
        self.sum_abs = 0.0
        self.sum_sq = 0.0
        self.max_abs = 0.0
        self.pos = 0.0
        self.n = 0
        self.dims: Dict[int, DimStats] = {}

    def update(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        self.count += 1
        self.sum_abs += float(np.abs(x).sum())
        self.sum_sq += float((x.astype(np.float64) ** 2).sum())
        self.max_abs = max(self.max_abs, float(np.abs(x).max(initial=0.0)))
        self.pos += float((x > 0).sum())
        self.n += x.size
        if x.ndim == 0:
            return
        for d in range(x.ndim):
            if d not in self.dims:
                self.dims[d] = DimStats(
                    x.shape[d], with_eigs=x.shape[d] <= self.max_eig_dim
                )
            self.dims[d].update(x, d)

    def summary(self) -> str:
        if self.n == 0:
            return "empty"
        mean_abs = self.sum_abs / self.n
        rms = (self.sum_sq / self.n) ** 0.5
        pos = self.pos / self.n
        return (
            f"abs-mean={mean_abs:.3g} rms={rms:.3g} "
            f"max-abs={self.max_abs:.3g} pos-frac={pos:.2f}"
        )

    def report_lines(self, name: str) -> List[str]:
        lines = []
        for d in sorted(self.dims):
            lines.extend(self.dims[d].report_lines(name, d))
        return lines


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

    def collect_params(self, params, prefix="param/", suffix=""):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = prefix + "/".join(
                str(getattr(k, "key", getattr(k, "idx", "?"))) for k in path
            ) + suffix
            self.stats.setdefault(name, TensorStats()).update(np.asarray(leaf))

    def collect_output_grads(self, pert_grads, suffix=".grad"):
        """Feed the gradient tree of the loss w.r.t. the 'perturbations'
        collection produced by `output_perturbations` — dLoss/d(output) for
        every module, i.e. the reference's backward-hook `{module}.grad`
        tables (ref diagnostics.py:129)."""
        flat = jax.tree_util.tree_flatten_with_path(pert_grads)[0]
        for path, leaf in flat:
            name = _path_str(path)
            if name.endswith("/" + _PERTURB_NAME):
                name = name[: -(len(_PERTURB_NAME) + 1)]
            elif name == _PERTURB_NAME:
                name = "<root>"
            if hasattr(leaf, "shape"):
                self.stats.setdefault(name + suffix, TensorStats()).update(
                    np.asarray(leaf)
                )

    def print_diagnostics(self, log=logging.info):
        for name in sorted(self.stats):
            log(f"Diagnostics [{name}]: {self.stats[name].summary()}")
            for line in self.stats[name].report_lines(name):
                log(line)


_PERTURB_NAME = "grad_out"


def _output_perturb_interceptor(next_fn, args, kwargs, context):
    """flax intercept_methods hook: add a zero 'perturbations' variable to
    every module's __call__ output. Differentiating the loss w.r.t. that
    collection yields dLoss/d(module output) for EVERY module in one vjp —
    the JAX replacement for the reference's per-module backward hooks
    (ref diagnostics.py:129 `{module}.grad` tables), with no per-module
    instrumentation in the model code."""
    import jax.numpy as jnp

    y = next_fn(*args, **kwargs)
    if context.method_name != "__call__":
        return y
    mod = context.module
    try:
        if (
            mod is not None
            and hasattr(y, "dtype")
            and hasattr(y, "shape")
            and jnp.issubdtype(y.dtype, jnp.floating)
        ):
            y = mod.perturb(_PERTURB_NAME, y)
    except Exception:
        # a module called twice with a different output shape, or an
        # immutable-collection edge: diagnostics must never break the loss
        return y
    return y


def output_perturbations():
    """Context manager enabling the per-module-output perturbation tap.

    Usage:
        with output_perturbations():
            loss, mut = model.apply({"params": p}, ..., train=True,
                                    mutable=["perturbations"], rngs=...)
        zeros = jax.tree.map(jnp.zeros_like, mut["perturbations"])
        # then inside the same context manager:
        #   grads = jax.grad(loss_fn_taking_perturbations)(zeros)
    """
    import flax.linen as nn

    return nn.intercept_methods(_output_perturb_interceptor)


class BackwardTables:
    """Shared driver for the backward-side diagnostic tables used by both
    trainers' --print-diagnostics: builds the zero-perturbation tree lazily,
    jits one grad of the loss w.r.t. (params, perturbations), and feeds a
    DiagnosticsCollector with `{param}.param_grad` and `{module}.grad`
    entries (reference diagnostics.py:129 tag taxonomy).

    init_fn() -> the 'perturbations' variable collection of one forward
      (called once under the output_perturbations interceptor; return the
      collection itself — zeros are derived here).
    loss_fn(params, perturbations, *args) -> scalar loss; traced with the
      interceptor active, so every module output picks up its tap.
    """

    def __init__(self, init_fn, loss_fn):
        self._init_fn = init_fn

        def _wrapped(params, perts, *args):
            with output_perturbations():
                return loss_fn(params, perts, *args)

        self._grad_fn = jax.jit(jax.grad(_wrapped, argnums=(0, 1)))
        self._zero_perts = None

    def collect(self, diag: "DiagnosticsCollector", params, *args) -> None:
        import jax.numpy as jnp

        if self._zero_perts is None:
            with output_perturbations():
                perts = self._init_fn()
            self._zero_perts = jax.tree.map(jnp.zeros_like, perts)
        param_grads, out_grads = self._grad_fn(params, self._zero_perts, *args)
        diag.collect_params(param_grads, prefix="param/", suffix=".param_grad")
        diag.collect_output_grads(out_grads)


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
