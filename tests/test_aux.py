"""Tests for auxiliary subsystems: diagnostics, inf-check, env info, utils."""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from flow2gan_tpu.training.diagnostics import DiagnosticsCollector, TensorStats
from flow2gan_tpu.training.env import get_env_info
from flow2gan_tpu.training.err import raise_nonfinite_loss_error
from flow2gan_tpu.training.hooks import (
    check_finite,
    find_nonfinite_leaves,
    finite_flags,
)
from flow2gan_tpu.utils import (
    AttributeDict,
    MetricsTracker,
    convert_length,
    make_pad_mask,
    safe_log,
)


def test_tensor_stats():
    s = TensorStats()
    s.update(np.ones((4, 8)))
    s.update(-2 * np.ones((4, 8)))
    out = s.summary()
    assert "abs-mean=1.5" in out
    assert "pos-frac=0.50" in out


def test_diagnostics_on_model_intermediates():
    from flow2gan_tpu.models import BiasNorm

    m = BiasNorm(8)
    x = jnp.ones((2, 4, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    _, inter = m.apply(
        v, x, capture_intermediates=True, mutable=["intermediates"]
    )
    d = DiagnosticsCollector()
    d.collect_intermediates(inter["intermediates"])
    d.collect_params(v["params"])
    assert len(d.stats) >= 2
    lines = []
    d.print_diagnostics(log=lines.append)
    assert any("param/" in l for l in lines)


def test_finite_flags_detect_nan():
    tree = {"a": {"x": jnp.ones(3)}, "b": {"y": jnp.asarray([1.0, jnp.nan])}}
    flags = finite_flags(tree)
    assert bool(flags["a"]) and not bool(flags["b"]) and not bool(flags["__all__"])
    assert check_finite(flags, "grads") is False
    assert find_nonfinite_leaves(tree) == ["b/y"]


def test_env_info_keys():
    info = get_env_info()
    for k in ("jax-version", "git-sha1", "hostname", "backend"):
        assert k in info


def test_err_message():
    try:
        raise_nonfinite_loss_error(123)
    except RuntimeError as e:
        assert "batch 123" in str(e) and "base-lr" in str(e)
    else:
        raise AssertionError("should raise")


def test_metrics_tracker_math():
    a = MetricsTracker()
    a["samples"] = 2
    a["loss"] = 4.0
    b = MetricsTracker()
    b["samples"] = 2
    b["loss"] = 8.0
    c = a + b
    assert dict(c.norm_items())["loss"] == 3.0
    assert "over 4.00 samples" in str(c)
    d = c * 0.5
    assert d["loss"] == 6.0


def test_pad_mask_and_convert_length():
    m = make_pad_mask(jnp.asarray([1, 3]), 4)
    np.testing.assert_array_equal(
        np.asarray(m), [[False, True, True, True], [False, False, False, True]]
    )
    x = jnp.ones((2, 3))
    assert convert_length(x, 5).shape == (2, 5)
    assert convert_length(x, 2).shape == (2, 2)
    assert float(convert_length(x, 5)[0, 4]) == 0.0
    assert float(safe_log(jnp.asarray(0.0))) == np.log(1e-7).astype(np.float32)


def test_attribute_dict():
    d = AttributeDict({"a": 1})
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    assert '"a": 1' in str(d)
