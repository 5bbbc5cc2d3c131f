"""Discrete pseudo-codec tokenizer: log-mel frames vector-quantized to a
k-means codebook.

This is the token *source* for the token-conditioned generator
(`TokenAudioGenerator`): the reference's CondEncoder is explicitly designed
for "codec embeddings" conditioning (reference models/modules.py:499) but the
reference ships no codec — and this image has no network egress to fetch one —
so the driveable token path quantizes the model's own mel frontend with
k-means, the standard pseudo-codec construction (HuBERT-style discrete
units). The codebook is fit OFFLINE (`scripts/train_tokenizer.py`) and frozen;
tokenization itself is a jittable matmul + argmin that runs on-device inside
the train step, exactly like the mel frontend it replaces.

Artifact format: `.npz` with `centroids` (K, n_mels) float32 plus the mel
frontend constants (`sampling_rate`, `n_fft`, `hop_length`, `n_mels`) so a
tokenizer file is self-describing and checked against the model config at
load time.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from flow2gan_tpu.ops.mel import LogMelSpectrogram


class MelKMeansTokenizer:
    """audio (B, L) -> int32 tokens (B, frames).

    One token per mel frame: the log-mel column's nearest centroid by
    Euclidean distance. `||x||^2` is constant across centroids, so the
    argmin needs only `-2 x.C^T + ||C||^2` — one (B*T, n_mels) x
    (n_mels, K) matmul, MXU-friendly at any batch.
    """

    def __init__(
        self,
        centroids: np.ndarray,
        sampling_rate: int,
        n_fft: int,
        hop_length: int,
        n_mels: int,
    ):
        centroids = np.asarray(centroids, np.float32)
        assert centroids.ndim == 2 and centroids.shape[1] == n_mels, centroids.shape
        self.centroids = jnp.asarray(centroids)
        self._c_sq = jnp.sum(self.centroids * self.centroids, axis=1)  # (K,)
        self.vocab_size = centroids.shape[0]
        self.sampling_rate = sampling_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.mel_fn = LogMelSpectrogram(
            sampling_rate=sampling_rate,
            n_fft=n_fft,
            hop_length=hop_length,
            n_mels=n_mels,
        )

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        mel = self.mel_fn(audio)  # (B, n_mels, T)
        return self.quantize(mel)

    def quantize(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, n_mels, T) log-mel -> (B, T) int32 token ids."""
        frames = mel.swapaxes(-1, -2).astype(jnp.float32)  # (B, T, n_mels)
        # squared-distance argmin without the constant ||frames||^2 term
        scores = -2.0 * frames @ self.centroids.T + self._c_sq  # (B, T, K)
        return jnp.argmin(scores, axis=-1).astype(jnp.int32)

    def save(self, path) -> None:
        np.savez(
            path,
            centroids=np.asarray(self.centroids, np.float32),
            sampling_rate=self.sampling_rate,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            n_mels=self.n_mels,
        )

    @classmethod
    def from_file(cls, path, expect_config: Optional[dict] = None
                  ) -> "MelKMeansTokenizer":
        """Load an .npz codebook; if `expect_config` (a generator config with
        mel_* keys) is given, fail loudly on any frontend/vocab mismatch."""
        with np.load(Path(path)) as z:
            tok = cls(
                centroids=z["centroids"],
                sampling_rate=int(z["sampling_rate"]),
                n_fft=int(z["n_fft"]),
                hop_length=int(z["hop_length"]),
                n_mels=int(z["n_mels"]),
            )
        if expect_config is not None:
            cfg = dict(expect_config)
            checks = {
                "sampling_rate": tok.sampling_rate,
                "mel_n_fft": tok.n_fft,
                "mel_hop_length": tok.hop_length,
                "n_mels": tok.n_mels,
                "vocab_size": tok.vocab_size,
            }
            for key, got in checks.items():
                want = cfg.get(key)
                if want is not None and int(want) != int(got):
                    raise ValueError(
                        f"tokenizer {path} has {key}={got}, model config "
                        f"expects {want}"
                    )
        return tok


def kmeans_fit(
    frames: np.ndarray,
    k: int,
    iters: int = 30,
    seed: int = 0,
    chunk: int = 65536,
) -> np.ndarray:
    """Deterministic Lloyd k-means on (N, D) float32 frames -> (k, D) centroids.

    Plain numpy (offline, CPU): random distinct-point init, chunked
    assignment, empty clusters reseeded to the currently-worst-fit points.
    """
    X = np.asarray(frames, np.float32)
    n = X.shape[0]
    if n < k:
        raise ValueError(f"need at least k={k} frames, got {n}")
    rng = np.random.RandomState(seed)
    C = X[rng.choice(n, size=k, replace=False)].copy()

    def assign(C):
        c_sq = np.sum(C * C, axis=1)
        labels = np.empty(n, np.int64)
        dists = np.empty(n, np.float32)
        for s in range(0, n, chunk):
            x = X[s : s + chunk]
            d = -2.0 * x @ C.T + c_sq  # + ||x||^2, constant per row
            li = np.argmin(d, axis=1)
            labels[s : s + chunk] = li
            dists[s : s + chunk] = d[np.arange(len(x)), li] + np.sum(x * x, axis=1)
        return labels, dists

    for _ in range(iters):
        labels, dists = assign(C)
        counts = np.bincount(labels, minlength=k)
        sums = np.zeros_like(C)
        np.add.at(sums, labels, X)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        n_empty = int((~nonempty).sum())
        if n_empty:
            # reseed dead centroids on the worst-fit frames
            worst = np.argsort(-dists)[:n_empty]
            C[~nonempty] = X[worst]
    return C


def load_token_frontend(cfg, tokenizer_path, model_name: str = "?"):
    """Load the conditioning frontend for a token_* config, or None for mel.

    One shared entry for every CLI (pretrain/finetune/infer) and the API, so
    tokenizer validation stays in lockstep: raises a uniform error when a
    token-conditioned model is driven without `--tokenizer`, and validates
    the codebook against the model config on load.
    """
    if dict(cfg).get("conditioning", "mel") != "tokens":
        return None
    if not tokenizer_path:
        raise ValueError(
            f"model {model_name} is token-conditioned; pass --tokenizer "
            "<codebook.npz> (fit one with scripts/train_tokenizer.py)"
        )
    import logging

    tok = MelKMeansTokenizer.from_file(tokenizer_path, expect_config=cfg)
    logging.info(
        f"Token conditioning: K={tok.vocab_size} codebook from {tokenizer_path}"
    )
    return tok
