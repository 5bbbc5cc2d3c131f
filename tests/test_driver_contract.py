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
