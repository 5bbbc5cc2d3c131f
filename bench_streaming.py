#!/usr/bin/env python3
"""Streaming chunked-inference bench (VERDICT r3 "Next round #7"): xRT for
long audio through `bin/infer_dir`'s halo-chunked path vs whole-file
inference, at 24 kHz and 44.1 kHz, plus halo-seam correctness.

The chunked mode is the designated long-audio story (SURVEY.md §5): every
chunk is padded to ONE static frame count so the jitted synth compiles once;
a receptive-field halo (3 frames/layer) is synthesized on both sides and
trimmed, so seams carry full context.

Run on the real chip: `python bench_streaming.py [--seconds 60]`.
Timing follows the verify-skill rule for the axon tunnel: enqueue the chunk
stream, then fetch one scalar from the LAST output to drain the queue —
never trust block_until_ready.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flow2gan_tpu.bin.infer_dir import make_synth, streaming_infer  # noqa: E402
from flow2gan_tpu.data.audio_io import read_wav, resample  # noqa: E402
from flow2gan_tpu.ops.mel import LogMelSpectrogram  # noqa: E402


def long_audio(seconds: float, sr: int) -> np.ndarray:
    """>= `seconds` of audio: the bundled reference test wavs, tiled."""
    wav_dir = Path("/root/reference/test_data/wav")
    wavs = sorted(wav_dir.glob("*.wav"))
    if not wavs:
        raise FileNotFoundError(f"no .wav files under {wav_dir}")
    parts = []
    total = 0
    while total < seconds * 24000:
        for f in wavs:
            a, fsr = read_wav(f)
            a = np.asarray(a, np.float32).reshape(-1)
            parts.append(a)
            total += len(a)
    audio = np.concatenate(parts)[: int(seconds * 24000)]
    if sr != 24000:
        audio = np.asarray(resample(audio, 24000, sr), np.float32).reshape(-1)
    return audio


def bench_model(model_name: str, seconds: float, chunk_frames: int,
                n_timesteps: int = 1, checkpoint: str = None):
    # get_model owns module build + template init + checkpoint load (random
    # params when checkpoint=None; trained weights make seam_mel_l1
    # meaningful — the output is then cond-determined, not noise vs noise)
    from flow2gan_tpu.api import get_model

    vm = get_model(model_name, checkpoint=checkpoint)
    cfg, model, params = vm.config, vm.module, vm.variables["params"]
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate, n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length, n_mels=cfg.n_mels,
    )
    audio = long_audio(seconds, cfg.sampling_rate)
    mel = np.asarray(jax.jit(mel_fn)(jnp.asarray(audio[None])))[0]
    synth = make_synth(model, n_timesteps, seed=0)
    dur = mel.shape[-1] * cfg.mel_hop_length / cfg.sampling_rate

    def run_stream():
        return streaming_infer(
            synth, params, mel, chunk_frames,
            num_layers=max(cfg.num_layers), hop=cfg.mel_hop_length,
        )

    # warm (compile) both paths
    w_stream = run_stream()
    whole = np.asarray(synth(params, jnp.asarray(mel[None])))[0]

    # --- seam correctness: chunked output must match whole-file where the
    # receptive field is satisfied (identical params/noise seed; the noise
    # draw differs per chunk shape, so compare spectra not samples)
    sfn = jax.jit(mel_fn)
    m_stream = np.asarray(sfn(jnp.asarray(w_stream[None])))[0]
    m_whole = np.asarray(sfn(jnp.asarray(whole[: len(w_stream)][None])))[0]
    n = min(m_stream.shape[-1], m_whole.shape[-1])
    seam_mel_l1 = float(np.abs(m_stream[:, :n] - m_whole[:, :n]).mean())

    # --- timing: enqueue-then-drain (verify-skill tunnel rule)
    t0 = time.perf_counter()
    out = run_stream()
    _ = float(out[-1])  # host array already; drain happened inside
    dt_stream = time.perf_counter() - t0

    t0 = time.perf_counter()
    o = synth(params, jnp.asarray(mel[None]))
    _ = float(np.asarray(o.ravel()[0]))
    dt_whole = time.perf_counter() - t0

    return {
        "model": model_name,
        "audio_s": round(dur, 2),
        "chunk_frames": chunk_frames,
        "stream_xrt": round(dur / dt_stream, 1),
        "whole_xrt": round(dur / dt_whole, 1),
        "seam_mel_l1": round(seam_mel_l1, 4),
        "n_timesteps": n_timesteps,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--chunk-frames", type=int, default=512)
    p.add_argument("--ckpt-24k", type=str, default=None,
                   help="Trained mel_24k_base generator ckpt (seam check)")
    p.add_argument("--ckpt-44k", type=str, default=None)
    args = p.parse_args()
    rows = []
    for name, ck in (
        ("mel_24k_base", args.ckpt_24k),
        ("mel_44k_128band_512x_base", args.ckpt_44k),
    ):
        r = bench_model(name, args.seconds, args.chunk_frames, checkpoint=ck)
        r["trained_ckpt"] = bool(ck)
        rows.append(r)
        print(json.dumps(r))
    out = {"rows": rows}
    Path("results").mkdir(exist_ok=True)
    Path("results/streaming_bench.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
