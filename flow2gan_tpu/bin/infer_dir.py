#!/usr/bin/env python3
"""Directory inference: every .wav (audio mode) or .npy/.pt mel (mel mode) in
a directory, with optional STREAMING CHUNKED inference.

Re-design of /root/reference/flow2gan/bin/infer_dir.py. The chunked mode
keeps the reference's receptive-field halo (side_context = 3 * num_layers
frames for k=7 convs, infer_dir.py:145-146) but pads every chunk to the SAME
static frame count so the jitted synth function compiles once — the
TPU-native answer to arbitrary-length audio.
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from flow2gan_tpu.data.audio_io import read_wav, write_wav
from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.utils import enable_compilation_cache, setup_logger, str2bool


def get_parser():
    parser = argparse.ArgumentParser(
        description="Directory inference (TPU), wav or mel inputs, "
        "optional streaming chunked mode",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--model-name", type=str, default="mel_24k_base")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--hf-model-name", type=str, default=None)
    parser.add_argument("--input-dir", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--mel", type=str2bool, default=False,
                        help="Inputs are mel files (.npy / .pt) instead of wavs")
    parser.add_argument("--tokens", type=str2bool, default=False,
                        help="Inputs are int token files (.npy) for token_* "
                        "configs (synthesize straight from discrete tokens)")
    parser.add_argument("--tokenizer", type=str, default=None,
                        help="k-means codebook .npz — required for token_* "
                        "configs with wav inputs (audio is tokenized first)")
    parser.add_argument("--n-timesteps", type=int, default=1)
    parser.add_argument("--chunk-size", type=int, default=0,
                        help="Streaming: mel frames per chunk (0 = whole file)")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def load_mel_file(path: Path) -> np.ndarray:
    if path.suffix == ".npy":
        mel = np.load(path)
    elif path.suffix == ".pt":
        import torch

        mel = torch.load(path, map_location="cpu").numpy()
    else:
        raise ValueError(f"unsupported mel file {path}")
    if mel.ndim == 3:
        mel = mel[0]
    return mel.astype(np.float32)  # (n_mels, frames)


def make_synth(model, n_timesteps, seed):
    @jax.jit
    def synth(params, cond):
        return model.apply(
            {"params": params},
            cond,
            n_timesteps=n_timesteps,
            clamp_pred=True,
            method="infer",
            rngs={"noise": jax.random.PRNGKey(seed)},
        )

    return synth


def streaming_infer(
    synth, params, cond: np.ndarray, chunk_size: int, num_layers: int, hop: int
) -> np.ndarray:
    """Chunked inference with receptive-field halo (reference
    infer_dir.py:126-168), static chunk shapes.

    cond: (n_mels, frames) log-mel or (frames,) int tokens — frames on the
    LAST axis — -> waveform (frames * hop,)
    """
    side = 3 * num_layers  # conv k=7 -> 3 frames/layer receptive field
    frames = cond.shape[-1]
    padded_chunk = chunk_size + 2 * side  # static jit shape
    outs = []
    start = 0
    while start < frames:
        end = min(start + chunk_size, frames)
        lo = max(0, start - side)
        hi = min(frames, end + side)
        seg = cond[..., lo:hi]
        left_halo = start - lo
        right_halo = hi - end
        # pad to the static chunk length (replicate edges so the model sees
        # plausible context; trimmed away below)
        pad_right = padded_chunk - seg.shape[-1]
        if pad_right > 0:
            pad_spec = [(0, 0)] * (seg.ndim - 1) + [(0, pad_right)]
            seg = np.pad(seg, pad_spec, mode="edge")
        wav = np.asarray(synth(params, jnp.asarray(seg[None])))[0]
        lo_s = left_halo * hop
        hi_s = (left_halo + (end - start)) * hop
        outs.append(wav[lo_s:hi_s])
        start = end
    return np.concatenate(outs)


def main():
    args = get_parser().parse_args()
    args.output_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(f"{args.output_dir}/log/log-infer-dir")
    enable_compilation_cache()
    logging.info(vars(args))

    from flow2gan_tpu.api import get_model

    vm = get_model(
        model_name=args.model_name,
        hf_model_name=args.hf_model_name,
        checkpoint=args.checkpoint,
        tokenizer=args.tokenizer,
    )
    model, cfg = vm.module, vm.config
    is_token_model = cfg.get("conditioning", "mel") == "tokens"
    if is_token_model and not (args.tokens or args.tokenizer):
        raise ValueError(
            "token_* config: pass --tokens true (int .npy inputs) or "
            "--tokenizer <codebook.npz> (wav inputs)"
        )
    params = vm.variables["params"]
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate,
        n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length,
        n_mels=cfg.n_mels,
    )
    synth = make_synth(model, args.n_timesteps, args.seed)

    if args.tokens:
        files = sorted(args.input_dir.glob("*.npy"))
    elif args.mel:
        files = sorted(
            list(args.input_dir.glob("*.npy")) + list(args.input_dir.glob("*.pt"))
        )
    else:
        files = sorted(args.input_dir.glob("*.wav"))
    if not files:
        raise FileNotFoundError(f"no input files in {args.input_dir}")

    total_audio, total_time = 0.0, 0.0
    for f in files:
        if args.tokens:
            cond = np.load(f)
            if cond.ndim == 2:
                cond = cond[0]
            cond = cond.astype(np.int32)  # (frames,)
        elif args.mel:
            cond = load_mel_file(f)
        else:
            audio, sr = read_wav(f)
            if audio.shape[0] > 1:
                audio = audio.mean(axis=0, keepdims=True)
            if sr != cfg.sampling_rate:
                from flow2gan_tpu.data.audio_io import resample

                audio = resample(audio, sr, cfg.sampling_rate)
            if is_token_model:
                cond = np.asarray(vm.tokens(jnp.asarray(audio)))[0]
            else:
                cond = np.asarray(mel_fn(jnp.asarray(audio)))[0]

        t0 = time.perf_counter()
        if args.chunk_size > 0:
            wav = streaming_infer(
                synth,
                params,
                cond,
                args.chunk_size,
                num_layers=max(cfg.num_layers),
                hop=cfg.mel_hop_length,
            )
        else:
            wav = np.asarray(synth(params, jnp.asarray(cond[None])))[0]
        dt = time.perf_counter() - t0

        out = args.output_dir / (f.stem + ".wav")
        write_wav(out, wav, cfg.sampling_rate)
        dur = len(wav) / cfg.sampling_rate
        total_audio += dur
        total_time += dt
        logging.info(f"{f.name}: {dur:.2f}s audio in {dt:.2f}s -> {out}")

    logging.info(
        f"Done: {total_audio:.1f}s audio in {total_time:.1f}s "
        f"({total_audio / max(total_time, 1e-9):.1f}x real-time)"
    )


if __name__ == "__main__":
    main()
