#!/usr/bin/env python3
"""Scan LibriTTS split directories into recordings.jsonl.gz manifests.

Re-design of /root/reference/scripts/prepare_recordings_libritts.py without
the lhotse dependency; the manifests it writes are lhotse-compatible
(readable by both frameworks).
"""

from __future__ import annotations

import sys
from pathlib import Path

# scripts/ is the script dir on sys.path, not the repo root; make the
# package importable regardless of cwd/PYTHONPATH (also inherited by
# ProcessPoolExecutor workers via sys.path pickling at spawn)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import logging
from pathlib import Path

from flow2gan_tpu.data.dataset import scan_dir_to_recordings, write_recording_manifest

logging.basicConfig(level=logging.INFO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-dir", type=Path, required=True,
                   help="LibriTTS root (contains train-clean-100/ etc.)")
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument(
        "--splits",
        type=str,
        default="train-clean-100,train-clean-360,dev-clean,test-clean",
    )
    args = p.parse_args()
    args.output_dir.mkdir(parents=True, exist_ok=True)

    for split in args.splits.split(","):
        split_dir = args.corpus_dir / split
        if not split_dir.exists():
            logging.warning(f"skip missing split {split_dir}")
            continue
        recs = scan_dir_to_recordings(split_dir)
        out = args.output_dir / f"libritts_recordings_{split.replace('-', '_')}.jsonl.gz"
        write_recording_manifest(recs, out)
        logging.info(f"{split}: {len(recs)} recordings -> {out}")


if __name__ == "__main__":
    main()
