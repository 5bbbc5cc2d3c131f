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


def test_dominant_parameters():
    """Ranks leaves by RMS-weighted grad-norm share (reference
    show_dominant_parameters, optim.py:670-734)."""
    import numpy as np
    from flow2gan_tpu.training.optim import dominant_parameters

    grads = {"a": np.ones((4, 4), np.float32) * 10.0,
             "b": {"w": np.ones((4,), np.float32) * 0.1}}
    out = dominant_parameters(grads, top_n=2)
    assert out[0][0] == "a" and out[0][1] > 0.99
    assert out[1][0] == "b/w"
    # RMS weighting can flip the ranking
    rms = {"a": np.float32(0.001), "b": {"w": np.float32(100.0)}}
    out2 = dominant_parameters(grads, param_rms=rms, top_n=2)
    assert out2[0][0] == "b/w"


def test_scalar_diagnostics_perturb():
    """PReLU perturbation taps yield dL/d(activation) histograms (reference
    ScalarDiagnostic, diagnostics.py:337-511)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from flow2gan_tpu.models import norms
    from flow2gan_tpu.training.diagnostics import (
        ScalarDiagnostic,
        collect_scalar_diagnostics,
        print_scalar_diagnostics,
    )

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8)(x)
            x = norms.PReLU(channels=8)(x)
            return nn.Dense(1)(x).sum()

    net = Net()
    x = jnp.ones((4, 8))
    with norms.diagnostic_perturbations():
        variables = net.init(jax.random.PRNGKey(0), x)
        assert "perturbations" in variables
        perts = jax.tree.map(jnp.zeros_like, variables["perturbations"])

        def ploss(p):
            out, mut = net.apply(
                {"params": variables["params"], "perturbations": p},
                x,
                capture_intermediates=lambda m, _: type(m).__name__ == "PReLU",
                mutable=["intermediates"],
            )
            return out, mut["intermediates"]

        (_, inter), pgrads = jax.value_and_grad(ploss, has_aux=True)(perts)

    stats = {}
    collect_scalar_diagnostics(stats, inter, pgrads)
    assert len(stats) == 1
    (name, sd), = stats.items()
    assert sd.counts.sum() == 4 * 8
    assert np.isfinite(sd.grad_abs).all() and sd.grad_abs.sum() > 0
    print_scalar_diagnostics(stats, log=lambda s: None)
    # perturb must be a no-op outside the context (normal training path)
    variables2 = net.init(jax.random.PRNGKey(0), x)
    assert "perturbations" not in variables2
    y1 = net.apply({"params": variables["params"]}, x)
    np.testing.assert_allclose(np.asarray(y1), float(_ := net.apply(
        {"params": variables2["params"]}, x)), rtol=1e-6)
