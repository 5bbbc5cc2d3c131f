#!/usr/bin/env python3
"""Average epoch checkpoints and export a deployment model file.

Re-design of /root/reference/flow2gan/bin/save_averaged_model.py:
plain averaging or running-average differencing, optional GAN-generator
unwrap; writes a {'model': params} .ckpt (loadable by get_model / infer).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from flow2gan_tpu.training import checkpoint as ckpt
from flow2gan_tpu.utils import setup_logger, str2bool


def get_parser():
    parser = argparse.ArgumentParser(
        description="Average checkpoints and save a deployment model",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-dir", type=Path, required=True)
    parser.add_argument("--epoch", type=int, required=True,
                        help="Last epoch to include")
    parser.add_argument("--avg", type=int, required=True,
                        help="Number of epochs to average")
    parser.add_argument("--use-averaged-model", type=str2bool, default=True,
                        help="Running-average differencing (reference default)")
    parser.add_argument("--load-gan", type=str2bool, default=False,
                        help="Epoch checkpoints are GAN checkpoints; "
                        "export the generator only")
    parser.add_argument("--output", type=Path, default=None,
                        help="Output path (default exp-dir/averaged.ckpt)")
    return parser


def main():
    args = get_parser().parse_args()
    out = args.output or (args.exp_dir / "averaged.ckpt")
    setup_logger(f"{args.exp_dir}/log/log-average")
    logging.info(vars(args))

    use_averaged = args.use_averaged_model
    if use_averaged:
        start = args.exp_dir / f"epoch-{args.epoch - args.avg}.ckpt"
        end = args.exp_dir / f"epoch-{args.epoch}.ckpt"
        if not start.exists():
            if args.epoch - args.avg == 0:
                # Exp dirs from trainers that predate the epoch-0 snapshot:
                # the window (epoch-0, epoch-N] is the whole run, so a plain
                # average of all N epochs is the closest defined estimator.
                # Round 4 lost three trained GAN models to a hard exit here.
                logging.warning(
                    f"{start} does not exist (trainer predates the epoch-0 "
                    f"snapshot); FALLING BACK to a plain average of epochs "
                    f"1..{args.epoch}"
                )
                use_averaged = False
            else:
                raise SystemExit(
                    f"Windowed averaging over ({start}, {end}] needs the "
                    f"start checkpoint, which does not exist (epoch "
                    f"{args.epoch} with --avg {args.avg} reaches before the "
                    f"first saved epoch). Use a smaller --avg, or "
                    f"--use-averaged-model false for a plain average of the "
                    f"last {args.avg} epochs."
                )
    if use_averaged:
        logging.info(f"Windowed running-average over ({start}, {end}]")
        tree = ckpt.average_checkpoints_with_averaged_model(start, end)
    else:
        files = [
            args.exp_dir / f"epoch-{e}.ckpt"
            for e in range(args.epoch - args.avg + 1, args.epoch + 1)
        ]
        logging.info(f"Plain average over {len(files)} checkpoints")
        tree = ckpt.average_checkpoints(files)

    if args.load_gan and isinstance(tree, dict) and "generator" in tree:
        tree = tree["generator"]

    ckpt.save_checkpoint(out, params=tree)
    logging.info(f"Saved averaged model to {out}")


if __name__ == "__main__":
    main()
