#!/usr/bin/env python3
"""Fréchet Speech Distance on Wav2Vec2-base mean-pooled embeddings at 16 kHz.

Re-design of /root/reference/scripts/compute_fsd.py: same metric definition
(Fréchet distance between Gaussians fit to utterance-level mean-pooled
wav2vec2 hidden states, sqrtm-stabilized), torch/CPU-friendly. The wav2vec2
weights come from --model-path (a local directory) or the HF hub when the
environment has network access.
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
import os
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO)


def get_parser():
    p = argparse.ArgumentParser(description="Fréchet Speech Distance")
    p.add_argument("--ref-dir", type=Path, required=True)
    p.add_argument("--gen-dir", type=Path, required=True)
    p.add_argument("--file-list", type=Path, default=None,
                   help="Optional list of relative wav paths")
    p.add_argument("--model-path", type=str, default="facebook/wav2vec2-base",
                   help="HF id or local dir of the wav2vec2 model")
    p.add_argument("--cache", type=Path, default=None,
                   help="Cache embeddings to this .npz")
    p.add_argument("--output", type=Path, default=None)
    return p


def load_files(dir_: Path, file_list):
    if file_list:
        names = [l.strip() for l in open(file_list) if l.strip()]
        return [dir_ / n for n in names]
    return sorted(dir_.rglob("*.wav"))


def embed_files(files, model, fe, device="cpu"):
    import torch

    from flow2gan_tpu.data.audio_io import read_wav, resample

    embs = []
    with torch.no_grad():
        for f in files:
            audio, sr = read_wav(f)
            audio = audio.mean(axis=0)
            if sr != 16000:
                audio = resample(audio, sr, 16000)
            inputs = fe(audio, sampling_rate=16000, return_tensors="pt")
            out = model(inputs.input_values.to(device))
            embs.append(out.last_hidden_state.mean(dim=1)[0].cpu().numpy())
    return np.stack(embs)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Fréchet distance with sqrtm stabilization
    (reference compute_fsd.py:158-217)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def main():
    args = get_parser().parse_args()
    # Fail fast when the model must come from the Hub on an egress-less
    # host: HF_HUB_OFFLINE skips the 5x-retry network probing (~2 min of
    # backoff per from_pretrained). Only defaulted on when the Hub host
    # doesn't even resolve — hosts with network (or a user-set value)
    # keep normal download behavior.
    if not os.path.isdir(args.model_path) and "HF_HUB_OFFLINE" not in os.environ:
        import socket

        try:
            socket.setdefaulttimeout(3)
            socket.getaddrinfo("huggingface.co", 443)
        except OSError:
            os.environ["HF_HUB_OFFLINE"] = "1"
        finally:
            socket.setdefaulttimeout(None)

    try:
        from transformers import Wav2Vec2FeatureExtractor, Wav2Vec2Model
    except ImportError as e:
        raise SystemExit(f"transformers required for FSD: {e}")

    try:
        fe = Wav2Vec2FeatureExtractor.from_pretrained(args.model_path)
        model = Wav2Vec2Model.from_pretrained(args.model_path)
    except Exception as e:
        raise SystemExit(
            f"Could not load wav2vec2 from {args.model_path} "
            f"(no network? pass a local --model-path): {e}"
        )
    model.eval()

    ref_files = load_files(args.ref_dir, args.file_list)
    gen_files = load_files(args.gen_dir, args.file_list)
    logging.info(f"{len(ref_files)} ref / {len(gen_files)} gen files")

    import hashlib

    ref_key = hashlib.sha256(
        "\n".join(str(f) for f in ref_files).encode()
    ).hexdigest()[:16]
    cache = {}
    if args.cache and args.cache.exists():
        cache = dict(np.load(args.cache, allow_pickle=False))
    if "ref" in cache and str(cache.get("ref_key")) == ref_key:
        ref_emb = cache["ref"]
    else:
        if "ref" in cache:
            logging.warning("embedding cache is for a different ref set; recomputing")
        ref_emb = embed_files(ref_files, model, fe)
    gen_emb = embed_files(gen_files, model, fe)
    if args.cache:
        np.savez(args.cache, ref=ref_emb, ref_key=np.asarray(ref_key))

    mu_r, sig_r = ref_emb.mean(0), np.cov(ref_emb, rowvar=False)
    mu_g, sig_g = gen_emb.mean(0), np.cov(gen_emb, rowvar=False)
    fsd = frechet_distance(mu_r, sig_r, mu_g, sig_g)
    result = {"fsd": fsd, "n_ref": len(ref_files), "n_gen": len(gen_files)}
    print(json.dumps(result))
    if args.output:
        args.output.write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
