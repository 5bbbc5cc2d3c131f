"""Light-weight checks of the driver-facing contracts (__graft_entry__ and
bench.py structure). The heavy compile paths are exercised by the driver
itself and by tests/test_parallel.py."""

import importlib.util
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_graft_entry_shape():
    ge = _load("graft_entry_test", REPO / "__graft_entry__.py")
    assert callable(ge.entry)
    assert callable(ge.dryrun_multichip)
    # dryrun on 2 virtual devices must execute a full train step
    ge.dryrun_multichip(2)


def test_bench_module_structure():
    bench = _load("bench_test", REPO / "bench.py")
    assert bench.BASELINE_XRT_GPU_1STEP == 851.67
    assert callable(bench.measure)
    assert callable(bench.main)


def test_bench_train_module_structure():
    bt = _load("bench_train_test", REPO / "bench_train.py")
    assert callable(bt.main)


def _bench():
    return _load("bench_wd_test", REPO / "bench.py")


def test_bench_watchdog_scoped_to_tunneled_tpu(monkeypatch):
    bench = _bench()
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert not bench.CompileWatchdog().active  # not the tunneled runtime
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not bench.CompileWatchdog().active  # jax pinned off the tunnel
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert bench.CompileWatchdog().active


def test_bench_watchdog_kick_cancel_and_abort(monkeypatch, capsys):
    bench = _bench()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("BENCH_WATCHDOG_S", "30")
    wd = bench.CompileWatchdog()
    wd.kick()
    wd.kick()  # re-arm replaces the previous timer
    assert wd._timer is not None
    wd.cancel()
    assert wd._timer is None

    # The abort path must print the driver's ONE-JSON-line contract and
    # exit 2 (a wedged compile helper must never hang the round's bench).
    exit_codes = []
    monkeypatch.setattr(bench.os, "_exit", exit_codes.append)
    wd._abort()
    line = capsys.readouterr().out.strip()
    payload = json.loads(line)
    assert payload["metric"] == "xrt_24k_1step_b16"
    assert payload["value"] == 0.0
    assert "wedged" in payload["error"]
    assert exit_codes == [2]
