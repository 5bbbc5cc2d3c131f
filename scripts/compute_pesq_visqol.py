#!/usr/bin/env python3
"""PESQ / ViSQOL / multi-resolution-STFT distance between generated and
ground-truth wav directories.

Re-design of /root/reference/scripts/compute_pesq_visqol.py:
- the MR-STFT distance is implemented natively (numpy; spectral-convergence
  + log-magnitude L1 over fft sizes 1024/2048/512, the auraloss default) —
  no auraloss dependency;
- wb-PESQ uses the `pesq` package when installed, otherwise it is skipped
  with a warning (not baked into this image);
- ViSQOL shells out to a `visqol` binary when present on PATH (speech mode,
  clips shorter than 1 s are padded like the reference), otherwise skipped.

Writes per-file metrics.json + an averaged summary line.
"""

from __future__ import annotations

import sys
from pathlib import Path

# scripts/ is the script dir on sys.path, not the repo root; make the
# package importable regardless of cwd/PYTHONPATH (also inherited by
# ProcessPoolExecutor workers via sys.path pickling at spawn)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import logging
import shutil
import subprocess
import tempfile
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO)

MRSTFT_FFTS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def get_parser():
    p = argparse.ArgumentParser(description="PESQ / ViSQOL / MR-STFT metrics")
    p.add_argument("--ref-dir", type=Path, required=True)
    p.add_argument("--gen-dir", type=Path, required=True)
    p.add_argument("--file-list", type=Path, default=None)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--with-visqol", action="store_true")
    p.add_argument("--output", type=Path, default=None)
    return p


def _stft_mag(x, n_fft, hop, win_length):
    win = np.hanning(win_length + 1)[:-1].astype(np.float64)
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx]
    w = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    w[off : off + win_length] = win
    return np.abs(np.fft.rfft(frames * w, axis=-1))


def mr_stft_distance(ref: np.ndarray, gen: np.ndarray) -> float:
    """Spectral convergence + log-magnitude L1, averaged over resolutions."""
    total = 0.0
    for n_fft, hop, win in MRSTFT_FFTS:
        r = _stft_mag(ref, n_fft, hop, win)
        g = _stft_mag(gen, n_fft, hop, win)
        sc = np.linalg.norm(r - g) / (np.linalg.norm(r) + 1e-9)
        lm = np.abs(np.log(r + 1e-7) - np.log(g + 1e-7)).mean()
        total += sc + lm
    return float(total / len(MRSTFT_FFTS))


def compute_one(pair):
    ref_path, gen_path, with_visqol = pair
    from flow2gan_tpu.data.audio_io import read_wav, resample, write_wav

    ref, sr_r = read_wav(ref_path)
    gen, sr_g = read_wav(gen_path)
    ref, gen = ref.mean(0), gen.mean(0)
    if sr_g != sr_r:
        gen = resample(gen, sr_g, sr_r)
    n = min(len(ref), len(gen))
    ref, gen = ref[:n], gen[:n]

    out = {"file": str(gen_path), "mrstft": mr_stft_distance(ref, gen)}

    ref16 = resample(ref, sr_r, 16000)
    gen16 = resample(gen, sr_r, 16000)
    try:
        from pesq import pesq as pesq_fn

        out["pesq"] = float(pesq_fn(16000, ref16, gen16, "wb"))
    except ImportError:
        out["pesq"] = None
        out["pesq_unavailable"] = "pesq package not installed"
    except Exception as e:  # NoUtterancesError etc. on silent/short clips
        logging.warning(f"pesq failed on {gen_path}: {e}")
        out["pesq"] = None
        out["pesq_unavailable"] = f"pesq failed: {e}"

    if with_visqol and shutil.which("visqol"):
        # pad < 1 s clips (reference compute_pesq_visqol.py:133-147)
        if len(ref16) < 16000:
            pad = 16000 - len(ref16)
            ref16 = np.pad(ref16, (0, pad))
            gen16 = np.pad(gen16, (0, pad))
        with tempfile.TemporaryDirectory() as td:
            rp, gp = Path(td) / "ref.wav", Path(td) / "gen.wav"
            write_wav(rp, ref16, 16000)
            write_wav(gp, gen16, 16000)
            try:
                res = subprocess.run(
                    [
                        "visqol",
                        "--reference_file", str(rp),
                        "--degraded_file", str(gp),
                        "--use_speech_mode",
                    ],
                    capture_output=True,
                    text=True,
                    timeout=120,
                )
                for line in res.stdout.splitlines():
                    if "MOS-LQO" in line:
                        out["visqol"] = float(line.split()[-1])
            except Exception as e:
                logging.warning(f"visqol failed on {gen_path}: {e}")
    return out


def main():
    args = get_parser().parse_args()
    if args.file_list:
        names = [l.strip() for l in open(args.file_list) if l.strip()]
        pairs = [
            (args.ref_dir / n, args.gen_dir / n, args.with_visqol) for n in names
        ]
    else:
        gen_files = sorted(args.gen_dir.rglob("*.wav"))
        pairs = [
            (args.ref_dir / f.relative_to(args.gen_dir), f, args.with_visqol)
            for f in gen_files
        ]
    pairs = [(r, g, v) for r, g, v in pairs if r.exists() and g.exists()]
    logging.info(f"Scoring {len(pairs)} file pairs")
    if not pairs:
        # Fail closed: round 4 committed an all-NaN artifact because this
        # script scored 0 pairs and exited 0. An empty evaluation is a
        # pipeline failure, not a result.
        logging.error(
            f"FAILED: 0 file pairs to score (ref-dir={args.ref_dir}, "
            f"gen-dir={args.gen_dir}) — refusing to write an empty summary"
        )
        raise SystemExit(2)

    try:
        from pesq import pesq as _  # noqa: F401
    except ImportError:
        logging.warning("pesq package not installed; PESQ will be null")

    with ProcessPoolExecutor(max_workers=args.num_workers) as ex:
        results = list(ex.map(compute_one, pairs))

    summary = {}
    for key in ("pesq", "visqol", "mrstft"):
        vals = [r.get(key) for r in results if r.get(key) is not None]
        summary[key] = float(np.mean(vals)) if vals else None
    # self-describing nulls: a reader of the artifact alone must not
    # mistake an unavailable backend for a zero/failed score
    if summary["pesq"] is None:
        reasons = {r["pesq_unavailable"] for r in results if "pesq_unavailable" in r}
        summary["pesq_unavailable"] = (
            "; ".join(sorted(reasons)) if reasons else "no file pairs scored"
        )
    if summary["visqol"] is None:
        summary["visqol_unavailable"] = (
            "visqol binary not on PATH or --with-visqol not set"
            if not (args.with_visqol and shutil.which("visqol"))
            else "no file pairs scored"
        )
    summary["n_files"] = len(results)
    print(json.dumps(summary))
    if args.output:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        args.output.write_text(
            json.dumps({"summary": summary, "files": results}, indent=2)
        )


if __name__ == "__main__":
    main()
