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


def test_backward_diagnostics_tables():
    """Backward-side tables (VERDICT r2 #3): per-module `.grad` (grad_output)
    and per-param `.param_grad` stats via the output_perturbations tap —
    the JAX equivalent of the reference's backward hooks (ref
    diagnostics.py:129 `{module}.grad` / `{param}.param_grad` taxonomy).
    Uses a synthetic model with a KNOWN gradient pattern: one branch is
    multiplied by 3.0 downstream (grad == 3), the other by 0.0 (grad == 0).
    """
    import flax.linen as nn

    from flow2gan_tpu.training.diagnostics import output_perturbations

    class Branch(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x + self.param("b", nn.initializers.zeros, (x.shape[-1],))

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            live = Branch(name="live")(x)
            dead = Branch(name="dead")(x)
            return jnp.sum(3.0 * live) + jnp.sum(0.0 * dead)

    m = M()
    x = jnp.ones((2, 5))
    with output_perturbations():
        v = m.init(jax.random.PRNGKey(0), x)
    assert "perturbations" in v
    perts = jax.tree.map(jnp.zeros_like, v["perturbations"])

    def loss_fn(p, q):
        with output_perturbations():
            return m.apply({"params": p, "perturbations": q}, x)

    pg, og = jax.grad(loss_fn, argnums=(0, 1))(v["params"], perts)
    d = DiagnosticsCollector()
    d.collect_output_grads(og)
    d.collect_params(pg, prefix="param/", suffix=".param_grad")

    assert "live.grad" in d.stats and "dead.grad" in d.stats
    assert abs(d.stats["live.grad"].sum_abs / d.stats["live.grad"].n - 3.0) < 1e-6
    assert d.stats["dead.grad"].max_abs == 0.0
    # param_grad: d/db sum(3*(x+b)) = 3 per element * 2 rows = 6
    pgl = d.stats["param/live/b.param_grad"]
    assert abs(pgl.sum_abs / pgl.n - 6.0) < 1e-6
    # report lines use the same percentile machinery as the forward tables
    lines = []
    d.print_diagnostics(log=lines.append)
    assert any(".grad]" in l or ".grad:" in l or ".grad" in l for l in lines)
    assert any(".param_grad" in l for l in lines)


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


def test_compile_retry_retries_transient_helper_kills():
    from flow2gan_tpu.training.err import call_with_compile_retry

    calls = []

    def flaky(x):
        calls.append(x)
        if len(calls) < 3:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500: "
                "tpu_compile_helper subprocess exit signal SIGKILL (9)"
            )
        return x + 1

    assert call_with_compile_retry(flaky, 41, retries=2, wait_s=0) == 42
    assert len(calls) == 3


def test_compile_retry_propagates_other_errors_immediately():
    from flow2gan_tpu.training.err import call_with_compile_retry

    calls = []

    def broken(_):
        calls.append(1)
        raise ValueError("a real bug, not the compile helper")

    try:
        call_with_compile_retry(broken, 0, retries=2, wait_s=0)
    except ValueError:
        pass
    else:
        raise AssertionError("should raise")
    assert len(calls) == 1  # no retry on non-transient errors


def test_compile_retry_exhausts_and_reraises():
    from flow2gan_tpu.training.err import call_with_compile_retry

    calls = []

    def wedged(_):
        calls.append(1)
        raise RuntimeError("remote_compile: HTTP 500: SIGKILL forever")

    try:
        call_with_compile_retry(wedged, 0, retries=2, wait_s=0)
    except RuntimeError as e:
        assert "remote_compile" in str(e)
    else:
        raise AssertionError("should raise")
    assert len(calls) == 3  # initial + 2 retries, then fail closed


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


def test_per_dim_diagnostics_and_eigs():
    """Reference-depth per-dim stats (diagnostics.py:46-334): percentile
    tables for every stat kind and an eigen-spectrum for dims <= 512."""
    from flow2gan_tpu.training.diagnostics import TensorStats

    rng = np.random.RandomState(0)
    # rank-1 dominated data: eigenvalue spread must show up
    u = rng.randn(64, 1) @ rng.randn(1, 32) + 0.01 * rng.randn(64, 32)
    s = TensorStats()
    s.update(u.astype(np.float32))
    s.update(u.astype(np.float32))
    lines = s.report_lines("t")
    kinds = {"abs", "positive", "value", "rms", "stddev", "max", "min", "eigs"}
    for kind in kinds:
        assert any(f" {kind} " in l for l in lines), (kind, lines[:3])
    assert any("rms-sort" in l for l in lines)
    # dim=1 has size 32 -> summarized percentiles
    eig_line = [l for l in lines if " eigs " in l and "dim=1" in l][0]
    assert "percentiles:" in eig_line and "norm=" in eig_line
    # rank-1 data: top eig >> median eig
    import re

    pts = [float(x) for x in re.search(r"percentiles: \[([^\]]*)\]", eig_line).group(1).split()]
    assert pts[-1] > 50 * max(pts[5], 1e-9)


def test_diagnostics_small_dim_prints_raw_values():
    from flow2gan_tpu.training.diagnostics import TensorStats

    s = TensorStats()
    s.update(np.ones((3, 4), np.float32))
    lines = s.report_lines("t")
    abs_line = [l for l in lines if "dim=0" in l and " abs " in l][0]
    assert "percentiles" not in abs_line  # size 3 <= 10: raw list


def test_nonfinite_module_localization():
    """An inf born in an intermediate activation is attributed to the module
    that produced it (reference hooks.py:27-96 fwd-hook warnings)."""
    import flax.linen as nn

    from flow2gan_tpu.training.hooks import find_nonfinite_module_outputs

    class Inner(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x / 0.0  # born here

    class Outer(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(4, name="ok_layer")(x)
            bad = Inner(name="bad_layer")(h)
            return nn.Dense(4, name="after")(bad)

    m = Outer()
    x = jnp.ones((2, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    _, inter = m.apply(v, x, capture_intermediates=True, mutable=["intermediates"])
    bad = find_nonfinite_module_outputs(inter["intermediates"])
    assert any("bad_layer" in b for b in bad), bad
    assert not any("ok_layer" in b for b in bad), bad


def test_nonfinite_localization_limit_keeps_birth_site():
    """The report limit is applied AFTER the birth-site partition: a birth
    site whose scope sorts alphabetically last must still be listed first,
    even when more than `limit` alphabetically-earlier downstream scopes are
    also non-finite."""
    from flow2gan_tpu.training.hooks import find_nonfinite_module_outputs

    inf = jnp.full((2,), jnp.inf)
    # nested a -> a/b -> a/b/c, inf visible at every level; alphabetical
    # flatten visits the enclosing (propagating) scopes first, so a
    # collection-time limit of 2 would never reach the birth site a/b/c
    inter = {
        "a": {
            "__call__": (inf,),
            "b": {"__call__": (inf,), "c": {"__call__": (inf,)}},
        }
    }
    bad = find_nonfinite_module_outputs(inter, limit=2)
    assert bad[0] == "a/b/c", bad  # deepest scope = birth-site candidate
    assert len(bad) == 2


def test_guard_calls_intermediates_fn(caplog):
    from flow2gan_tpu.training.hooks import NonfiniteLossGuard

    g = NonfiniteLossGuard()
    calls = []

    def intermediates_fn():
        calls.append(1)
        return {"mod": {"__call__": (jnp.asarray([jnp.inf]),)}}

    import logging as _logging

    with caplog.at_level(_logging.WARNING):
        g.check(float("nan"), 0.0, 1, lambda s: None,
                intermediates_fn=intermediates_fn)
    assert calls == [1]
    assert any("output of module mod is not finite" in r.message for r in caplog.records)


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from flow2gan_tpu.utils import enable_compilation_cache

    # on by default (resolves to the home cache dir); "off" disables.
    # HOME is redirected so the test never writes to the real home dir.
    monkeypatch.delenv("FLOW2GAN_COMPILATION_CACHE", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    default_dir = enable_compilation_cache()
    assert default_dir == str(tmp_path / ".cache" / "flow2gan_tpu" / "xla")
    jax.config.update("jax_compilation_cache_dir", None)
    monkeypatch.setenv("FLOW2GAN_COMPILATION_CACHE", "off")
    assert enable_compilation_cache() is None

    # explicit dir: enabled, and a compile populates it
    monkeypatch.setenv("FLOW2GAN_CACHE_MIN_COMPILE_SECS", "0")
    cache_dir = tmp_path / "xla-cache"
    assert enable_compilation_cache(str(cache_dir)) == str(cache_dir)
    try:
        f = jax.jit(lambda x: (x * 2.0).sum())
        f(jnp.ones((8, 8))).block_until_ready()
        assert any(cache_dir.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def test_tb_add_audio_without_soundfile(tmp_path):
    """tb_add_audio encodes PCM WAV with stdlib wave and writes a real
    Summary.Audio record when tensorboardX's soundfile-backed add_audio is
    unavailable (this image has no soundfile)."""
    import numpy as np
    from tensorboardX import SummaryWriter

    from flow2gan_tpu.utils import tb_add_audio

    w = SummaryWriter(str(tmp_path))
    pcm = (0.1 * np.sin(np.arange(2400) * 0.1)).astype(np.float32)
    tb_add_audio(w, "test/audio", pcm, 7, 24000)
    w.close()

    # read the event file back and find the audio record
    from tensorboardX.proto import event_pb2
    import struct

    fn = next(p for p in tmp_path.iterdir() if "tfevents" in p.name)
    data = fn.read_bytes()
    found = False
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        off += 12  # u64 length + u32 len-crc
        ev = event_pb2.Event()
        ev.ParseFromString(data[off : off + length])
        off += length + 4  # payload + u32 payload-crc
        for v in ev.summary.value:
            if v.tag == "test/audio" and v.HasField("audio"):
                assert v.audio.sample_rate == 24000
                assert v.audio.encoded_audio_string.startswith(b"RIFF")
                assert v.audio.length_frames == 2400
                found = True
    assert found


def test_save_test_samples_tags_and_lengths(tmp_path):
    """save_test_samples dumps per-sample GT + per-step audio/spec with the
    reference's TB tag taxonomy (ref bin/pretrain.py:608-680) and trims each
    sample to its true length; --save-infer-steps selects the step counts."""
    import struct

    from tensorboardX import SummaryWriter
    from tensorboardX.proto import event_pb2

    from flow2gan_tpu.bin.pretrain import save_test_samples
    from flow2gan_tpu.models import build_generator, get_generator_config
    from flow2gan_tpu.ops import LogMelSpectrogram
    from flow2gan_tpu.utils import AttributeDict

    cfg = get_generator_config("mel_24k_tiny")
    model = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate,
        n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length,
        n_mels=cfg.n_mels,
    )
    B, L = 2, 2048
    audio = 0.1 * np.random.RandomState(0).randn(B, L).astype(np.float32)
    lens = np.asarray([L, L - 300], np.int32)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "gate": rng, "dropout": rng},
        mel_fn(jnp.asarray(audio)),
        jnp.asarray(audio),
        jnp.asarray(lens),
        train=True,
    )
    params = AttributeDict(
        {
            "sampling_rate": cfg.sampling_rate,
            "batch_idx_train": 17,
            "save_infer_steps": "1,2",
        }
    )
    w = SummaryWriter(str(tmp_path))
    save_test_samples(
        params, model, variables["params"], mel_fn,
        {"audio": audio, "audio_lens": lens}, w,
    )
    w.close()

    audio_frames = {}  # tag -> length_frames
    image_tags = set()
    fn = next(p for p in tmp_path.iterdir() if "tfevents" in p.name)
    data = fn.read_bytes()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        off += 12
        ev = event_pb2.Event()
        ev.ParseFromString(data[off : off + length])
        off += length + 4
        for v in ev.summary.value:
            if v.HasField("audio"):
                audio_frames[v.tag] = v.audio.length_frames
            elif v.HasField("image"):
                image_tags.add(v.tag)

    for i, n in ((0, L), (1, L - 300)):
        for tag in (
            f"valid/test_audio_{i}_gt",
            f"valid/test_audio_{i}_step_1",
            f"valid/test_audio_{i}_step_2",
        ):
            assert audio_frames.get(tag) == n, (tag, audio_frames)
            assert f"{tag}_spec" in image_tags
    # only the requested step counts were dumped
    assert not any("step_4" in t or "step_8" in t for t in audio_frames)
