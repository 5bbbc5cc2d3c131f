#!/usr/bin/env python3
"""Write relative-path wav filelists for evaluation.

Re-design of /root/reference/scripts/prepare_test_list_libritts.py.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

logging.basicConfig(level=logging.INFO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-dir", type=Path, required=True)
    p.add_argument("--split", type=str, default="test-clean")
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--max-files", type=int, default=0)
    args = p.parse_args()

    split_dir = args.corpus_dir / args.split
    files = sorted(split_dir.rglob("*.wav"))
    if args.max_files:
        files = files[: args.max_files]
    args.output.parent.mkdir(parents=True, exist_ok=True)
    with open(args.output, "w") as f:
        for wav in files:
            f.write(str(wav.relative_to(args.corpus_dir)) + "\n")
    logging.info(f"{len(files)} files -> {args.output}")


if __name__ == "__main__":
    main()
