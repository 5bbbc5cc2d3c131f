#!/usr/bin/env python3
"""Pitch RMSE (cents), periodicity RMSE and voiced/unvoiced F1 between
generated and ground-truth audio.

Re-design of /root/reference/scripts/compute_pitch_periodicity.py. The
reference uses torchcrepe; this implementation uses torchcrepe when
installed, else a dependency-free YIN pitch tracker (de Cheveigné & Kawahara
2002) at the same hop (256 @ 16 kHz is the torchcrepe default; we track at
the native rate with hop 256). Metric definitions match the reference
(compute_pitch_periodicity.py:118-148): pitch RMSE in cents on mutually
voiced frames, periodicity RMSE everywhere, F1 on voiced decisions.
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
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO)

FMIN, FMAX = 50.0, 550.0
HOP = 256
PERIODICITY_THRESHOLD = 0.5


def get_parser():
    p = argparse.ArgumentParser(description="Pitch / periodicity / V-UV F1")
    p.add_argument("--ref-dir", type=Path, required=True)
    p.add_argument("--gen-dir", type=Path, required=True)
    p.add_argument("--file-list", type=Path, default=None)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--output", type=Path, default=None)
    return p


def yin_track(audio: np.ndarray, sr: int, hop: int = HOP):
    """YIN pitch + aperiodicity per frame.

    Returns (f0 Hz, periodicity in [0, 1]) arrays, one value per hop.
    Periodicity = 1 - min(cumulative mean normalized difference), i.e. high
    for strongly periodic frames — comparable to crepe's confidence.
    """
    tau_min = int(sr / FMAX)
    tau_max = int(sr / FMIN)
    frame = 2 * tau_max
    n_frames = max(0, (len(audio) - frame) // hop + 1)
    f0 = np.zeros(n_frames)
    period = np.zeros(n_frames)
    taus = np.arange(tau_max + 1)
    for i in range(n_frames):
        x = audio[i * hop : i * hop + frame].astype(np.float64)
        w = len(x)
        # d(tau) = sum_{j=0}^{w-tau-1} (x_j - x_{j+tau})^2
        #        = head_energy(tau) + tail_energy(tau) - 2 * xcorr(tau)
        spec = np.fft.rfft(x, 2 * w)
        ac = np.fft.irfft(spec * np.conj(spec))[: tau_max + 1]
        cumsq = np.concatenate([[0.0], np.cumsum(x**2)])
        head = cumsq[w - taus]  # sum x_j^2, j in [0, w - tau)
        tail = cumsq[w] - cumsq[taus]  # sum x_{j+tau}^2, j in [0, w - tau)
        d = np.maximum(head + tail - 2.0 * ac, 0.0)
        # cumulative mean normalized difference
        cmnd = np.ones(tau_max + 1)
        denom = np.cumsum(d[1:])
        cmnd[1:] = d[1:] * np.arange(1, tau_max + 1) / np.maximum(denom, 1e-12)
        seg = cmnd[tau_min : tau_max + 1]
        # absolute-threshold rule (YIN step 4): first tau dipping below 0.1,
        # else the global minimum — avoids subharmonic (octave-down) errors
        below = np.flatnonzero(seg < 0.1)
        if below.size:
            j = below[0]
            # walk to the local minimum of this dip
            while j + 1 < len(seg) and seg[j + 1] < seg[j]:
                j += 1
            tau = int(j) + tau_min
        else:
            tau = int(np.argmin(seg)) + tau_min
        # parabolic interpolation around the minimum
        if tau_min < tau < tau_max:
            a, b, c = cmnd[tau - 1], cmnd[tau], cmnd[tau + 1]
            denom2 = a - 2 * b + c
            if abs(denom2) > 1e-12:
                tau = tau + 0.5 * (a - c) / denom2
        f0[i] = sr / tau if tau > 0 else 0.0
        period[i] = float(np.clip(1.0 - seg.min(), 0.0, 1.0))
    return f0, period


def compute_one(pair):
    ref_path, gen_path = pair
    from flow2gan_tpu.data.audio_io import read_wav, resample

    ref, sr_r = read_wav(ref_path)
    gen, sr_g = read_wav(gen_path)
    ref, gen = ref.mean(0), gen.mean(0)
    sr = 16000
    ref = resample(ref, sr_r, sr)
    gen = resample(gen, sr_g, sr)
    n = min(len(ref), len(gen))
    ref, gen = ref[:n], gen[:n]

    try:
        import torch
        import torchcrepe

        def track(x):
            with torch.no_grad():
                f0, per = torchcrepe.predict(
                    torch.from_numpy(x[None]).float(), sr, HOP, FMIN, FMAX,
                    "full", return_periodicity=True, batch_size=512,
                )
            return f0[0].numpy(), per[0].numpy()

    except ImportError:

        def track(x):
            return yin_track(x, sr)

    f0_r, per_r = track(ref)
    f0_g, per_g = track(gen)
    n = min(len(f0_r), len(f0_g))
    f0_r, per_r, f0_g, per_g = f0_r[:n], per_r[:n], f0_g[:n], per_g[:n]

    v_r = per_r > PERIODICITY_THRESHOLD
    v_g = per_g > PERIODICITY_THRESHOLD
    both = v_r & v_g & (f0_r > 0) & (f0_g > 0)

    out = {"file": str(gen_path)}
    if both.sum() > 0:
        cents = 1200.0 * np.log2(f0_g[both] / f0_r[both])
        out["pitch_rmse_cents"] = float(np.sqrt(np.mean(cents**2)))
    else:
        out["pitch_rmse_cents"] = None
    out["periodicity_rmse"] = float(np.sqrt(np.mean((per_r - per_g) ** 2)))
    tp = float((v_r & v_g).sum())
    precision = tp / max(float(v_g.sum()), 1.0)
    recall = tp / max(float(v_r.sum()), 1.0)
    out["vuv_f1"] = (
        2 * precision * recall / max(precision + recall, 1e-9)
    )
    return out


def main():
    args = get_parser().parse_args()
    if args.file_list:
        names = [l.strip() for l in open(args.file_list) if l.strip()]
        pairs = [(args.ref_dir / nm, args.gen_dir / nm) for nm in names]
    else:
        gen_files = sorted(args.gen_dir.rglob("*.wav"))
        pairs = [(args.ref_dir / f.relative_to(args.gen_dir), f) for f in gen_files]
    pairs = [(r, g) for r, g in pairs if r.exists() and g.exists()]
    logging.info(f"Scoring {len(pairs)} file pairs")
    if not pairs:
        # Fail closed (round-4 lesson): an empty evaluation is a pipeline
        # failure, not a result — exit nonzero, write nothing.
        logging.error(
            f"FAILED: 0 file pairs to score (ref-dir={args.ref_dir}, "
            f"gen-dir={args.gen_dir}) — refusing to write an empty summary"
        )
        raise SystemExit(2)

    with ProcessPoolExecutor(max_workers=args.num_workers) as ex:
        results = list(ex.map(compute_one, pairs))

    summary = {}
    for key in ("pitch_rmse_cents", "periodicity_rmse", "vuv_f1"):
        vals = [r[key] for r in results if r.get(key) is not None]
        summary[key] = float(np.mean(vals)) if vals else None
    summary["n_files"] = len(results)
    print(json.dumps(summary))
    if args.output:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        args.output.write_text(
            json.dumps({"summary": summary, "files": results}, indent=2)
        )


if __name__ == "__main__":
    main()
