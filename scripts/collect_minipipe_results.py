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

    def read_metrics(name: str, d: Path):
        row = {}
        for kind in ("pesq", "pitch", "fsd"):
            f = d / f"metrics_{kind}.json"
            if not f.exists():
                continue
            data = json.loads(f.read_text())
            row[kind] = data.get("summary", data)
            (args.output_dir / f"{name}_metrics_{kind}.json").write_text(
                json.dumps(data, indent=2) + "\n"
            )
        if row:
            summary[name] = row

    for n in args.steps:
        read_metrics(f"gan_{n}step", args.exp_dir / f"gan_{n}step")
    for spec in args.extra:
        name, sep, path = spec.partition(":")
        if not sep or not Path(path).is_dir():
            raise SystemExit(f"--extra expects name:<existing-dir>, got {spec!r}")
        read_metrics(name, Path(path))

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


if __name__ == "__main__":
    main()
