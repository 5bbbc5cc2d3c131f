#!/usr/bin/env python3
"""Manifest-driven batch inference (wav -> mel -> wav reconstruction).

Re-design of /root/reference/flow2gan/bin/infer.py. Checkpoint resolution
mirrors the reference (bin/infer.py:249-306): --checkpoint (local .ckpt/.pt
or HF), --epoch N [--avg K [--use-averaged-model]], --load-gan to unwrap a
generator from a GAN checkpoint. Output wavs preserve relative paths.
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from flow2gan_tpu.data.audio_io import write_wav
from flow2gan_tpu.data.dataset import build_data_loader, read_recording_manifest
from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.training import checkpoint as ckpt
from flow2gan_tpu.utils import enable_compilation_cache, setup_logger, str2bool


def get_parser():
    parser = argparse.ArgumentParser(
        description="Batch inference over a recordings manifest (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-dir", type=Path, default=Path("exp/fm"))
    parser.add_argument("--model-name", type=str, default="mel_24k_base")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Explicit checkpoint path (.ckpt or torch .pt)")
    parser.add_argument("--hf-model-name", type=str, default=None)
    parser.add_argument("--epoch", type=int, default=None,
                        help="Use exp-dir/epoch-N.ckpt")
    parser.add_argument("--avg", type=int, default=None,
                        help="Average over the last K epochs")
    parser.add_argument("--use-averaged-model", type=str2bool, default=True,
                        help="With --avg: use running-average differencing")
    parser.add_argument("--load-gan", type=str2bool, default=False,
                        help="Checkpoint is a GAN checkpoint; unwrap generator")
    parser.add_argument("--recordings", type=str, required=True,
                        help="recordings.jsonl[.gz] manifest to reconstruct")
    parser.add_argument("--root-path", type=str, default=None,
                        help="Base for relative output paths")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--n-timesteps", type=int, default=1)
    parser.add_argument("--tokenizer", type=str, default=None,
                        help="k-means codebook .npz for token_* configs "
                        "(scripts/train_tokenizer.py): reconstruction runs "
                        "audio -> tokens -> audio")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    return parser


def resolve_params(args, model, init_params):
    """Checkpoint resolution (reference bin/infer.py:249-306)."""
    if args.checkpoint:
        path = args.checkpoint
    elif args.hf_model_name:
        from flow2gan_tpu.api import _download_from_hf

        path = _download_from_hf(args.hf_model_name)
    elif args.epoch is not None and args.avg:
        if args.use_averaged_model:
            start = args.exp_dir / f"epoch-{args.epoch - args.avg}.ckpt"
            end = args.exp_dir / f"epoch-{args.epoch}.ckpt"
            logging.info(f"Windowed average over ({start}, {end}]")
            tree = ckpt.average_checkpoints_with_averaged_model(start, end)
            return ckpt.restore_params(init_params, _unwrap(tree, args.load_gan))
        else:
            files = [
                args.exp_dir / f"epoch-{e}.ckpt"
                for e in range(args.epoch - args.avg + 1, args.epoch + 1)
            ]
            logging.info(f"Plain average of {len(files)} checkpoints")
            tree = ckpt.average_checkpoints(files)
            return ckpt.restore_params(init_params, _unwrap(tree, args.load_gan))
    elif args.epoch is not None:
        path = args.exp_dir / f"epoch-{args.epoch}.ckpt"
    else:
        raise ValueError("Provide --checkpoint, --hf-model-name, or --epoch")

    path = str(path)
    if path.endswith(".pt"):
        from flow2gan_tpu.compat.torch_convert import (
            convert_torch_state_dict,
            load_torch_file,
            strip_prefixes,
        )

        sd = load_torch_file(path)
        unwrap = args.load_gan or any(k.startswith("generator.") for k in sd)
        sd = strip_prefixes(sd, unwrap_generator=unwrap)
        params, _, _ = convert_torch_state_dict(sd, init_params)
        return params
    loaded = ckpt.load_checkpoint(path)
    tree = loaded["model"] if "model" in loaded else loaded
    return ckpt.restore_params(init_params, _unwrap(tree, args.load_gan))


def _unwrap(tree, load_gan: bool):
    if load_gan and isinstance(tree, dict) and "generator" in tree:
        return tree["generator"]
    return tree


def main():
    args = get_parser().parse_args()
    args.output_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(f"{args.output_dir}/log/log-infer")
    enable_compilation_cache()
    logging.info(vars(args))

    cfg = get_generator_config(args.model_name)
    model = build_generator(cfg)
    from flow2gan_tpu.ops.tokenizer import load_token_frontend

    tok = load_token_frontend(cfg, args.tokenizer, args.model_name)
    if tok is not None:
        cond_fn = tok
        example_cond = jnp.zeros((1, 16), jnp.int32)
    else:
        cond_fn = LogMelSpectrogram(
            sampling_rate=cfg.sampling_rate,
            n_fft=cfg.mel_n_fft,
            hop_length=cfg.mel_hop_length,
            n_mels=cfg.n_mels,
        )
        example_cond = jnp.zeros((1, cfg.n_mels, 16))
    rng = jax.random.PRNGKey(args.seed)
    init_params = model.init(
        {"params": rng, "noise": rng},
        example_cond,
        n_timesteps=1,
        method="infer",
    )["params"]
    params = resolve_params(args, model, init_params)

    @jax.jit
    def synth(params, cond, key):
        return model.apply(
            {"params": params},
            cond,
            n_timesteps=args.n_timesteps,
            clamp_pred=True,
            method="infer",
            rngs={"noise": key},
        )

    recs = read_recording_manifest(args.recordings)
    loader = build_data_loader(
        recs,
        root_path=args.root_path,
        sampling_rate=cfg.sampling_rate,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        train=False,
        apply_effects=False,
    )

    total_audio_s = 0.0
    t0 = time.perf_counter()
    for batch in loader:
        audio = jnp.asarray(batch["audio"])
        cond = cond_fn(audio)
        wav = np.asarray(synth(params, cond, rng))
        for i, name in enumerate(batch["file_names"]):
            n = int(batch["audio_lens"][i])
            rel = Path(name)
            if rel.is_absolute():
                # manifests without --root-path carry absolute sources;
                # `output_dir / "/abs"` would DISCARD output_dir and
                # overwrite the source corpus — keep the structure but stay
                # inside output_dir
                rel = Path(*rel.parts[1:])
            out_path = args.output_dir / rel
            out_path.parent.mkdir(parents=True, exist_ok=True)
            write_wav(out_path, wav[i, :n], cfg.sampling_rate)
            total_audio_s += n / cfg.sampling_rate
        logging.info(f"Wrote {len(batch['file_names'])} files")
    dt = time.perf_counter() - t0
    logging.info(
        f"Done: {total_audio_s:.1f}s of audio in {dt:.1f}s "
        f"({total_audio_s / max(dt, 1e-9):.1f}x real-time incl. IO)"
    )


if __name__ == "__main__":
    main()
