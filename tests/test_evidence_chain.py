"""The evidence chain must FAIL CLOSED.

Round 4 committed an all-NaN generalization artifact because every link
failed open: the metric scripts scored 0 pairs and exited 0, the collector
converted None -> NaN and wrote the table, and the drive committed it under
a message claiming real rows. These tests reproduce round 4's exact failure
inputs and require a red exit at every link (VERDICT r4, next-round #3).

The reference never needed this machinery (its numbers exist because a
human ran each stage interactively, run_libritts.sh:25-42); an autonomous
drive needs "empty result" to be a loud error, not a NaN.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _run(script, *argv):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *map(str, argv)],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)},
    )


def _write_wav(path, seconds=0.2, sr=24000, seed=0):
    from flow2gan_tpu.data.audio_io import write_wav

    path.parent.mkdir(parents=True, exist_ok=True)
    x = np.random.RandomState(seed).randn(int(sr * seconds)) * 0.1
    write_wav(path, x.astype(np.float32), sr)


def test_pesq_script_fails_on_zero_pairs(tmp_path):
    (tmp_path / "ref").mkdir()
    (tmp_path / "gen").mkdir()
    r = _run("compute_pesq_visqol.py", "--ref-dir", tmp_path / "ref",
             "--gen-dir", tmp_path / "gen",
             "--output", tmp_path / "m.json")
    assert r.returncode != 0, r.stdout + r.stderr
    assert "0 file pairs" in (r.stdout + r.stderr)
    assert not (tmp_path / "m.json").exists()


def test_pitch_script_fails_on_zero_pairs(tmp_path):
    (tmp_path / "ref").mkdir()
    (tmp_path / "gen").mkdir()
    r = _run("compute_pitch_periodicity.py", "--ref-dir", tmp_path / "ref",
             "--gen-dir", tmp_path / "gen",
             "--output", tmp_path / "m.json")
    assert r.returncode != 0, r.stdout + r.stderr
    assert not (tmp_path / "m.json").exists()


def test_pesq_script_succeeds_on_real_pair(tmp_path):
    """Control: one matching pair scores and exits 0 (fail-closed must not
    break the success path)."""
    _write_wav(tmp_path / "ref" / "a.wav", seed=1)
    _write_wav(tmp_path / "gen" / "a.wav", seed=2)
    r = _run("compute_pesq_visqol.py", "--ref-dir", tmp_path / "ref",
             "--gen-dir", tmp_path / "gen",
             "--output", tmp_path / "m.json")
    assert r.returncode == 0, r.stdout + r.stderr
    data = json.loads((tmp_path / "m.json").read_text())
    assert data["summary"]["n_files"] == 1
    assert data["summary"]["mrstft"] is not None


def _metrics_json(n_files, **vals):
    base = {"pesq": None, "visqol": None, "mrstft": None,
            "pitch_rmse_cents": None, "periodicity_rmse": None,
            "vuv_f1": None, "n_files": n_files}
    base.update(vals)
    return json.dumps({"summary": base, "files": []})


def test_collector_rejects_all_null_rows(tmp_path):
    """Reproduces round 4's exact failure shape: metrics files exist but
    every value is null with n_files=0. The collector must exit nonzero and
    publish no row for it."""
    d = tmp_path / "exp" / "fm_1step"
    d.mkdir(parents=True)
    (d / "metrics_pesq.json").write_text(_metrics_json(0))
    (d / "metrics_pitch.json").write_text(_metrics_json(0))
    out = tmp_path / "out"
    r = _run("collect_minipipe_results.py", "--exp-dir", tmp_path / "exp",
             "--output-dir", out, "--steps", "1",
             "--extra", f"fm_1step:{d}")
    assert r.returncode != 0, r.stdout + r.stderr
    assert "COLLECT_FAILED" in r.stdout
    summary = json.loads((out / "summary.json").read_text())
    assert "fm_1step" not in summary
    assert not (out / "fm_1step_metrics_pesq.json").exists()


def test_collector_rejects_missing_required_row(tmp_path):
    """A --extra dir with no metrics at all (the round-4 GAN export failure
    mode: training succeeded, export died, no metrics written) must be a
    red exit, not a silently absent row."""
    d = tmp_path / "exp" / "gan_1step"
    d.mkdir(parents=True)
    out = tmp_path / "out"
    r = _run("collect_minipipe_results.py", "--exp-dir", tmp_path / "exp",
             "--output-dir", out, "--steps", "1",
             "--extra", f"gan_1step:{d}")
    assert r.returncode != 0, r.stdout + r.stderr
    assert "COLLECT_FAILED" in r.stdout


def _iter_committed_metric_summaries():
    """Yield (path, summary-dict) for every metrics-shaped JSON committed
    under results/ — both per-run ``*metrics*.json`` files ({"summary":
    {..., n_files}}) and per-directory ``summary.json`` tables ({model:
    {"pesq": {...}, "pitch": {...}}})."""
    for p in sorted((REPO / "results").rglob("*.json")):
        d = json.loads(p.read_text())
        if isinstance(d.get("summary"), dict) and "n_files" in d["summary"]:
            yield p, d["summary"]
        elif p.name == "summary.json":
            for model, row in d.items():
                if not isinstance(row, dict):
                    continue
                for part in ("pesq", "pitch"):
                    if isinstance(row.get(part), dict) and "n_files" in row[part]:
                        yield p.parent / f"{p.name}#{model}.{part}", row[part]


def test_committed_artifacts_have_real_rows():
    """Lint the evidence actually committed at HEAD: every metrics summary
    under results/ must have scored files and at least one non-null metric.
    Round 4 shipped an all-null table under a commit message claiming real
    rows; this makes that unrepresentable — an empty artifact reddens the
    suite, not just the drive that produced it."""
    seen = 0
    for path, s in _iter_committed_metric_summaries():
        assert s["n_files"] > 0, f"{path}: empty metrics (n_files=0) committed"
        values = [v for k, v in s.items()
                  if k != "n_files" and isinstance(v, (int, float))]
        assert values, f"{path}: all metrics null with n_files={s['n_files']}"
        seen += 1
    assert seen >= 10, f"lint walked only {seen} summaries — glob broken?"


def test_committed_docs_have_no_placeholders():
    """No results README/summary.md at HEAD may carry an unexpanded
    '<!-- TABLE -->' placeholder or a NaN cell (ADVICE r4, low #5: the
    placeholder + narrated-conclusions combination is how empty evidence
    read as findings)."""
    for p in sorted((REPO / "results").rglob("*.md")):
        text = p.read_text()
        assert "<!-- TABLE -->" not in text, f"{p}: unexpanded placeholder"
        if p.name == "summary.md":
            assert "nan" not in text.lower(), f"{p}: NaN cell committed"


def test_collector_accepts_real_rows(tmp_path):
    d = tmp_path / "exp" / "gan_1step"
    d.mkdir(parents=True)
    (d / "metrics_pesq.json").write_text(_metrics_json(7, mrstft=0.61))
    (d / "metrics_pitch.json").write_text(
        _metrics_json(7, pitch_rmse_cents=242.0, periodicity_rmse=0.11,
                      vuv_f1=0.93))
    out = tmp_path / "out"
    r = _run("collect_minipipe_results.py", "--exp-dir", tmp_path / "exp",
             "--output-dir", out, "--steps", "1")
    assert r.returncode == 0, r.stdout + r.stderr
    summary = json.loads((out / "summary.json").read_text())
    assert summary["gan_1step"]["pesq"]["mrstft"] == 0.61
    md = (out / "summary.md").read_text()
    assert "nan" not in md.lower()
