#!/usr/bin/env python3
"""Collect the mini-pipeline rehearsal metrics into results/minipipe/.

Gathers the per-model metrics JSONs written by run_libritts.sh stage 6
(`<exp>/gan_{n}step/metrics_*.json`) plus the training logs' final loss
lines, and writes one summary JSON + a markdown table. This is the
artifact proving the reference's full pipeline (ref run_libritts.sh:25-42,
stages 1-6) composes end-to-end in this framework.

Usage:
  python scripts/collect_minipipe_results.py \
      --exp-dir /tmp/minipipe/exp --output-dir results/minipipe
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--steps", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--extra", type=str, nargs="*", default=[],
                   help="extra named metric dirs, e.g. fm:<path-to-dir>")
    args = p.parse_args()

    args.output_dir.mkdir(parents=True, exist_ok=True)
    summary = {}
    failures = []

    def _row_is_empty(row) -> bool:
        """True when no summary carries a single non-null metric value, or
        any present summary scored zero files."""
        any_value = False
        for s in row.values():
            if s.get("n_files") == 0:
                return True
            any_value = any_value or any(
                v is not None
                for k, v in s.items()
                if k not in ("n_files",) and not k.endswith("_unavailable")
            )
        return not any_value

    def read_metrics(name: str, d: Path, required: bool = False):
        row = {}
        pending = {}
        for kind in ("pesq", "pitch", "fsd"):
            f = d / f"metrics_{kind}.json"
            if not f.exists():
                continue
            data = json.loads(f.read_text())
            row[kind] = data.get("summary", data)
            pending[f"{name}_metrics_{kind}.json"] = data
        if row and _row_is_empty(row):
            # Fail closed (round-4 lesson: all-NaN rows shipped under a
            # commit message claiming real baselines): an empty row is a
            # pipeline failure; refuse to publish it.
            failures.append(f"{name}: metrics present but empty ({d})")
            return
        if not row:
            if required:
                failures.append(f"{name}: no metrics_*.json found in {d}")
            return
        for fname, data in pending.items():
            (args.output_dir / fname).write_text(
                json.dumps(data, indent=2) + "\n"
            )
        summary[name] = row

    for n in args.steps:
        read_metrics(f"gan_{n}step", args.exp_dir / f"gan_{n}step")
    for spec in args.extra:
        name, sep, path = spec.partition(":")
        if not sep or not Path(path).is_dir():
            raise SystemExit(f"--extra expects name:<existing-dir>, got {spec!r}")
        read_metrics(name, Path(path), required=True)

    (args.output_dir / "summary.json").write_text(
        json.dumps(summary, indent=2) + "\n"
    )

    lines = [
        "| model | MR-STFT ↓ | pitch RMSE (cents) ↓ | periodicity RMSE ↓ | V/UV F1 ↑ |",
        "|---|---|---|---|---|",
    ]
    for name, row in summary.items():
        pq = row.get("pesq", {})
        pt = row.get("pitch", {})

        def v(d, key):
            # metrics JSONs use null for unavailable metrics, so .get's
            # default alone doesn't cover it
            x = d.get(key)
            return float("nan") if x is None else x

        lines.append(
            f"| {name} | {v(pq, 'mrstft'):.3f} "
            f"| {v(pt, 'pitch_rmse_cents'):.0f} "
            f"| {v(pt, 'periodicity_rmse'):.3f} "
            f"| {v(pt, 'vuv_f1'):.3f} |"
        )
    (args.output_dir / "summary.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    if failures:
        for f in failures:
            print(f"COLLECT_FAILED {f}")
        raise SystemExit(2)
    if not summary:
        print("COLLECT_FAILED no rows collected at all")
        raise SystemExit(2)


if __name__ == "__main__":
    main()
