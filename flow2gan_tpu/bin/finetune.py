#!/usr/bin/env python3
"""GAN fine-tuning (stage 2) on a TPU mesh.

Re-design of /root/reference/flow2gan/bin/finetune.py: D-only warmup for
`--gen-start-batch-idx` batches, then strict D/G alternation
(finetune.py:604-626); two ScaledAdam+Eden2 pairs with separate lrs
(0.02/0.002) and lr_batches (5000/20000); 7 loss scales; generator
initialized from an averaged FM checkpoint; branch dropout disabled.

Usage:
  python -m flow2gan_tpu.bin.finetune \
    --exp-dir exp/gan_4step --model-name mel_24k_base \
    --generator-model-path exp/fm/averaged.ckpt --n-timesteps 4 \
    --train-recordings data/train_recordings.jsonl.gz --batch-size 64
"""

from __future__ import annotations

import argparse
import logging
import random
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from flow2gan_tpu.data.dataset import build_data_loader, read_recording_manifest
from flow2gan_tpu.models import (
    build_generator,
    get_gan_config,
    get_generator_config,
)
from flow2gan_tpu.models.discriminators import Discriminators
from flow2gan_tpu.models.gan import make_mel_recon_fns
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from flow2gan_tpu.training import checkpoint as ckpt
from flow2gan_tpu.bin.pretrain import (
    restore_sampler_state,
    sampler_state_snapshot,
    save_test_samples,
)
from flow2gan_tpu.training.env import get_env_info
from flow2gan_tpu.training.err import (
    call_with_compile_retry,
    raise_nonfinite_loss_error,
)
from flow2gan_tpu.training.hooks import NonfiniteLossGuard
from flow2gan_tpu.training.gan_step import (
    GANLossScales,
    GANTrainState,
    init_gan_train_state,
    make_gan_grad_fns,
    make_gan_steps,
)
from flow2gan_tpu.training.optim import (
    dominant_parameters,
    eden2_lr,
    make_lr_scale_tree,
    parse_lr_scale_rules,
    scaled_adam,
)
from flow2gan_tpu.utils import (
    AttributeDict,
    MetricsTracker,
    enable_compilation_cache,
    setup_logger,
    str2bool,
    to_float_tuple,
)


def get_parser():
    parser = argparse.ArgumentParser(
        description="GAN fine-tuning (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-dir", type=Path, default=Path("exp/gan"))
    parser.add_argument("--model-name", type=str, default="mel_24k_base")
    parser.add_argument("--gan-name", type=str, default="gan_multi_scale_mel_recon")
    parser.add_argument("--generator-model-path", type=str, default=None,
                        help="Averaged FM checkpoint (.ckpt or torch .pt)")
    parser.add_argument("--tokenizer", type=str, default=None,
                        help="k-means codebook .npz for token_* configs "
                        "(scripts/train_tokenizer.py)")
    parser.add_argument("--n-timesteps", type=int, default=1)
    parser.add_argument("--num-epochs", type=int, default=20)
    parser.add_argument("--start-epoch", type=int, default=1)
    parser.add_argument("--lr-g", type=float, default=0.002)
    parser.add_argument("--lr-d", type=float, default=0.02)
    parser.add_argument("--lr-batches-g", type=float, default=20000)
    parser.add_argument("--lr-batches-d", type=float, default=5000)
    parser.add_argument("--warmup-batches", type=float, default=500,
                        help="Eden2 linear-warmup length in batches")
    parser.add_argument("--warmup-start", type=float, default=0.1,
                        help="Eden2 warmup starting fraction (the reference "
                        "finetune passes 0.1 for BOTH schedulers, ref "
                        "bin/finetune.py:918-921, overriding the class "
                        "default of 0.5)")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--duration", type=float, default=1.5)
    parser.add_argument("--max-load-times", type=int, default=3)
    parser.add_argument("--train-recordings", type=str, required=False)
    parser.add_argument("--train-dls-weights", type=str, default=None)
    parser.add_argument("--valid-recordings", type=str, required=False)
    parser.add_argument(
        "--test-recordings",
        type=str,
        required=False,
        help="Recording manifest whose full-length samples are synthesized "
        "at --n-timesteps and dumped to TB every validation (reference "
        "bin/finetune.py:233,724); falls back to the first validation batch.",
    )
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--disc-loss-mp-scale", type=float, default=1.0)
    parser.add_argument("--disc-loss-mr-scale", type=float, default=0.1)
    parser.add_argument("--gen-loss-mp-scale", type=float, default=1.0)
    parser.add_argument("--gen-loss-mr-scale", type=float, default=0.1)
    parser.add_argument("--feat-map-loss-mp-scale", type=float, default=1.0)
    parser.add_argument("--feat-map-loss-mr-scale", type=float, default=0.1)
    parser.add_argument("--mel-recon-loss-scale", type=float, default=45.0)
    parser.add_argument("--gen-start-batch-idx", type=int, default=1000,
                        help="D-only warmup length before alternation starts")
    parser.add_argument("--average-period", type=int, default=200)
    parser.add_argument("--log-interval", type=int, default=50)
    parser.add_argument("--valid-interval", type=int, default=1000)
    parser.add_argument("--save-every-n", type=int, default=4000)
    parser.add_argument("--keep-last-k", type=int, default=30)
    parser.add_argument("--tensorboard", type=str2bool, default=True)
    parser.add_argument("--inf-check", type=str2bool, default=False,
                        help="On a hard-clipped (zeroed) D or G update, rank "
                        "parameters by gradient-norm share and name the "
                        "module whose output went non-finite (reference "
                        "finetune.py:171,633-656 attaches inf-check hooks "
                        "to BOTH optimizers)")
    parser.add_argument("--print-diagnostics", type=str2bool, default=False,
                        help="Collect generator activation stats (fwd + "
                        "grad_output/param_grad tables + act-vs-grad "
                        "histograms) for 5 batches, print, exit")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of batches 10-15")
    parser.add_argument("--remat-rollout", type=str2bool, default=False,
                        help="Rematerialize the G-step's Euler rollout "
                        "(scan-body remat at n_timesteps>1): residual memory "
                        "~one step regardless of n_timesteps, ~1 extra "
                        "forward of FLOPs. Needed for 44.1 kHz 4-step at "
                        "batch 16 on one v5e chip.")
    parser.add_argument("--freeze-modules", type=str, default=None,
                        help="CSV of generator param-path prefixes to freeze "
                        "(lr 0) during GAN fine-tuning, e.g. 'cond_encoder'")
    parser.add_argument("--lr-scale-rules", type=str, default=None,
                        help="CSV of prefix=scale generator lr multipliers")
    parser.add_argument("--resume-from", type=str, default=None,
                        help="Mid-epoch resume from a checkpoint-<N>.ckpt "
                        "written by --save-every-n (restores both optimizers, "
                        "train_disc alternation state, and sampler position)")
    return parser


def load_generator_init(path: str, model, init_params, mel_fn):
    """Initialize generator params from an averaged FM checkpoint
    (reference --generator-model-path, bin/finetune.py:410-426)."""
    if path.endswith(".pt"):
        from flow2gan_tpu.compat.torch_convert import (
            convert_torch_state_dict,
            load_torch_file,
            strip_prefixes,
        )

        sd = strip_prefixes(load_torch_file(path))
        params, _, _ = convert_torch_state_dict(sd, init_params)
        return params
    loaded = ckpt.load_checkpoint(path)
    tree = loaded["model"] if "model" in loaded else loaded
    return ckpt.restore_params(init_params, tree)


def _make_diag_objective(
    generator, discriminators, mel_fn, mel_recon_fns, scales, n_timesteps,
    remat_rollout=False,
):
    """G objective + perturbation-tap rollout shared by every finetune
    diagnostics surface (backward tables, scalar act-vs-grad pass) — ONE
    place to keep the diagnostics rollouts in sync with the trained
    objective (new rng streams / rollout kwargs get added here only).

    Returns (g_loss_fn, rollout_perturbations); the rollout must be called
    under whichever tap interceptor the caller uses (output_perturbations /
    diagnostic_perturbations) and returns the un-zeroed 'perturbations'
    collection of one train-mode rollout."""
    from flow2gan_tpu.training.gan_step import make_gan_loss_fns

    _, g_loss_fn = make_gan_loss_fns(
        generator, discriminators, mel_fn, mel_recon_fns,
        n_timesteps=n_timesteps, scales=scales, remat_rollout=remat_rollout,
    )

    def rollout_perturbations(params_g, batch, rng):
        _, mut = generator.apply(
            {"params": params_g},
            mel_fn(batch["audio"]),
            audio_lens=batch["audio_lens"],
            n_timesteps=n_timesteps,
            clamp_pred=False,
            train=True,
            method="infer",
            rngs={
                "noise": rng,
                "gate": jax.random.fold_in(rng, 1),
                "dropout": jax.random.fold_in(rng, 2),
            },
            mutable=["perturbations"],
        )
        return mut["perturbations"]

    return g_loss_fn, rollout_perturbations


def _run_scalar_diagnostics(
    generator, discriminators, mel_fn, mel_recon_fns, params, scales,
    state, device_batch, step_rng,
):
    """Nonlinearity activation-vs-gradient histograms through the FULL G
    objective (rollout + discriminators + mel-recon) — finetune parity with
    pretrain's ScalarDiagnostic pass (reference diagnostics.py:337-511,
    attached by finetune at ref bin/finetune.py:633-656).

    Runs a 1-step rollout regardless of --n-timesteps: the shared
    perturbation tap sums dL/d(act) over every Euler step while
    capture_intermediates keeps per-call activations, so only a single-call
    rollout pairs each activation with exactly its own gradient (a k-step
    pass would pair step-0 activations with step-summed gradients)."""
    from flow2gan_tpu.models import norms as _norms
    from flow2gan_tpu.training.diagnostics import (
        collect_scalar_diagnostics,
        print_scalar_diagnostics,
    )

    g_loss_fn, rollout_perts = _make_diag_objective(
        generator, discriminators, mel_fn, mel_recon_fns, scales,
        n_timesteps=1,
    )
    srng = jax.random.fold_in(step_rng, 999)
    prelu_filter = lambda m, _: type(m).__name__ == "PReLU"
    with _norms.diagnostic_perturbations():
        # zero-perturbation tree from one train-mode rollout
        perts = jax.tree.map(
            jnp.zeros_like, rollout_perts(state.params_g, device_batch, srng)
        )

        def ploss(p):
            loss, metrics = g_loss_fn(
                state.params_g, state.params_d, device_batch, srng,
                extra_vars_g={"perturbations": p},
                capture_filter=prelu_filter,
            )
            return loss, metrics["_intermediates"]

        (_, inter), pgrads = jax.value_and_grad(ploss, has_aux=True)(perts)
    stats = {}
    collect_scalar_diagnostics(stats, inter, pgrads)
    print_scalar_diagnostics(stats)


def run(args):
    params = AttributeDict({"batch_idx_train": 0, "env_info": get_env_info()})
    params.update(vars(args))
    params.exp_dir = Path(params.exp_dir)
    params.exp_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(
        f"{params.exp_dir}/log/log-train",
        rank=jax.process_index(),
        world_size=jax.process_count(),
    )
    enable_compilation_cache()
    logging.info("GAN fine-tuning started")
    logging.info(params)

    random.seed(params.seed)
    np.random.seed(params.seed)

    cfg = get_generator_config(params.model_name)
    cfg["branch_dropout"] = 0.0  # reference disables it (bin/finetune.py:414)
    gan_cfg = get_gan_config(params.gan_name)
    generator = build_generator(cfg)
    discriminators = Discriminators()
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate,
        n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length,
        n_mels=cfg.n_mels,
    )
    mel_recon_fns = make_mel_recon_fns(
        cfg.sampling_rate, gan_cfg.mel_recon_n_ffts, gan_cfg.mel_recon_n_mels
    )
    # cond_fn: audio -> model conditioning (mel, or k-means pseudo-codec
    # tokens for token_* configs); the mel-recon GAN loss + TB images keep
    # using the mel frontend either way.
    from flow2gan_tpu.ops.tokenizer import load_token_frontend

    cond_fn = (
        load_token_frontend(cfg, params.tokenizer, params.model_name)
        or mel_fn
    )

    params.sampling_rate = cfg.sampling_rate
    mesh = make_mesh(("data",))
    fixed_len = int(params.duration * cfg.sampling_rate)
    rng = jax.random.PRNGKey(params.seed)
    audio0 = jnp.zeros((2, fixed_len), jnp.float32)
    params_g = generator.init(
        {"params": rng, "noise": rng}, cond_fn(audio0), n_timesteps=1, method="infer"
    )["params"]
    params_d = discriminators.init(rng, audio0, audio0)["params"]

    if params.generator_model_path:
        logging.info(f"Loading generator from {params.generator_model_path}")
        params_g = load_generator_init(
            params.generator_model_path, generator, params_g, mel_fn
        )

    opt_g = scaled_adam(clipping_scale=2.0)
    opt_d = scaled_adam(clipping_scale=2.0)
    scales = GANLossScales(
        disc_mp=params.disc_loss_mp_scale,
        disc_mr=params.disc_loss_mr_scale,
        gen_mp=params.gen_loss_mp_scale,
        gen_mr=params.gen_loss_mr_scale,
        fmap_mp=params.feat_map_loss_mp_scale,
        fmap_mr=params.feat_map_loss_mr_scale,
        mel_recon=params.mel_recon_loss_scale,
    )
    rules = parse_lr_scale_rules(params.lr_scale_rules, params.freeze_modules)
    lr_scale_g = make_lr_scale_tree(params_g, rules) if rules else None
    if rules:
        logging.info(f"Generator lr scale rules: {rules}")
    d_step, g_step, eval_step = make_gan_steps(
        generator,
        discriminators,
        cond_fn,
        mel_recon_fns,
        opt_g,
        opt_d,
        lr_g_fn=lambda b: eden2_lr(
            params.lr_g, b, params.lr_batches_g,
            warmup_batches=params.warmup_batches,
            warmup_start=params.warmup_start,
        ),
        lr_d_fn=lambda b: eden2_lr(
            params.lr_d, b, params.lr_batches_d,
            warmup_batches=params.warmup_batches,
            warmup_start=params.warmup_start,
        ),
        n_timesteps=params.n_timesteps,
        scales=scales,
        remat_rollout=params.remat_rollout,
        lr_scale_g=lr_scale_g,
    )

    state = init_gan_train_state(
        replicate(params_g, mesh), replicate(params_d, mesh), opt_g, opt_d
    )
    model_avg = jax.tree.map(lambda x: np.asarray(x, np.float64), params_g)

    # resume
    if params.start_epoch > 1:
        resume = params.exp_dir / f"epoch-{params.start_epoch - 1}.ckpt"
        if resume.exists():
            logging.info(f"Resuming from {resume}")
            loaded = ckpt.load_checkpoint(resume)
            state = GANTrainState(
                params_g=replicate(
                    ckpt.restore_params(params_g, loaded["model"]["generator"]), mesh
                ),
                params_d=replicate(
                    ckpt.restore_params(params_d, loaded["model"]["discriminator"]),
                    mesh,
                ),
                opt_g=ckpt.restore_params(
                    jax.tree.map(np.asarray, state.opt_g), loaded["optimizer"]["g"]
                ),
                opt_d=ckpt.restore_params(
                    jax.tree.map(np.asarray, state.opt_d), loaded["optimizer"]["d"]
                ),
                batch_idx=jnp.asarray(loaded.get("batch_idx_train", 0), jnp.int32),
            )
            if loaded.get("model_avg") is not None:
                model_avg = ckpt.restore_params(model_avg, loaded["model_avg"])
            params.batch_idx_train = int(loaded.get("batch_idx_train", 0))
            params.train_disc = bool(loaded.get("train_disc", True))

    resume_sampler = None
    if params.resume_from:
        resume = Path(params.resume_from)
        logging.info(f"Mid-epoch resume from {resume}")
        loaded = ckpt.load_checkpoint(resume)
        state = GANTrainState(
            params_g=replicate(
                ckpt.restore_params(params_g, loaded["model"]["generator"]), mesh
            ),
            params_d=replicate(
                ckpt.restore_params(params_d, loaded["model"]["discriminator"]),
                mesh,
            ),
            opt_g=ckpt.restore_params(
                jax.tree.map(np.asarray, state.opt_g), loaded["optimizer"]["g"]
            ),
            opt_d=ckpt.restore_params(
                jax.tree.map(np.asarray, state.opt_d), loaded["optimizer"]["d"]
            ),
            batch_idx=jnp.asarray(loaded.get("batch_idx_train", 0), jnp.int32),
        )
        if loaded.get("model_avg") is not None:
            model_avg = ckpt.restore_params(model_avg, loaded["model_avg"])
        params.batch_idx_train = int(loaded.get("batch_idx_train", 0))
        params.train_disc = bool(loaded.get("train_disc", True))
        if loaded.get("sampler") is not None:
            resume_sampler = loaded["sampler"]
            params.start_epoch = int(resume_sampler["epoch"])
            logging.info(f"Sampler restored at epoch {params.start_epoch}")

    # ---- data
    if not params.train_recordings:
        raise SystemExit(
            "--train-recordings is required: a comma-separated list of "
            "recordings.jsonl[.gz] manifests (scripts/prepare_*_libritts.py)"
        )
    # --batch-size is GLOBAL: each process loads its 1/process_count share
    # (the loader shards recordings per process; shard_batch assembles the
    # global batch from host-local arrays)
    n_proc = jax.process_count()
    assert params.batch_size % n_proc == 0, (params.batch_size, n_proc)
    local_batch = params.batch_size // n_proc
    train_dls = [
        build_data_loader(
            read_recording_manifest(p),
            sampling_rate=cfg.sampling_rate,
            batch_size=local_batch,
            num_workers=params.num_workers,
            train=True,
            duration=params.duration,
            max_load_times=params.max_load_times,
            seed=params.seed,
            drop_last=True,
        )
        for p in params.train_recordings.split(",")
    ]
    dls_weights = (
        list(to_float_tuple(params.train_dls_weights))
        if params.train_dls_weights
        else [1.0] * len(train_dls)
    )
    valid_dls = []
    if params.valid_recordings:
        valid_dls = [
            build_data_loader(
                read_recording_manifest(p),
                sampling_rate=cfg.sampling_rate,
                batch_size=min(local_batch, 16),
                num_workers=params.num_workers,
                train=False,
                duration=params.duration,
            )
            for p in params.valid_recordings.split(",")
        ]
    # TB sample dumps at the trained step count every validation (reference
    # bin/finetune.py:724,804 — finetune dumps only n_timesteps, unlike
    # pretrain's --save-infer-steps list)
    params.save_infer_steps = str(params.n_timesteps)
    test_batch = None
    if params.test_recordings:
        test_dl = build_data_loader(
            read_recording_manifest(params.test_recordings),
            sampling_rate=cfg.sampling_rate,
            batch_size=8,
            num_workers=params.num_workers,
            train=False,
            duration=None,  # full-length samples (reference test_ds)
            apply_effects=False,
        )
        test_batch = next(iter(test_dl))
    elif valid_dls:
        test_batch = next(iter(valid_dls[0]))

    tb_writer = None
    if params.tensorboard and jax.process_index() == 0:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(log_dir=f"{params.exp_dir}/tensorboard")

    params.setdefault("train_disc", True)
    step_rng = jax.random.PRNGKey(params.seed + 1)
    guard = NonfiniteLossGuard()
    debug_grad_fns = None  # (grad_d, grad_g), built on first hard-clip

    diag = None
    diag_backward = None  # BackwardTables, built on first diagnostics batch
    if params.print_diagnostics:
        from flow2gan_tpu.training.diagnostics import DiagnosticsCollector

        diag = DiagnosticsCollector()

    def save_epoch(epoch):
        if jax.process_index() != 0:
            return
        ckpt.save_checkpoint(
            params.exp_dir / f"epoch-{epoch}.ckpt",
            params={
                "generator": jax.tree.map(np.asarray, state.params_g),
                "discriminator": jax.tree.map(np.asarray, state.params_d),
            },
            model_avg=model_avg,
            optimizer_state={
                "g": jax.tree.map(np.asarray, state.opt_g),
                "d": jax.tree.map(np.asarray, state.opt_d),
            },
            train_params={
                "batch_idx_train": params.batch_idx_train,
                "train_disc": params.train_disc,
                "env_info": params.env_info,
                "model_name": params.model_name,
                "n_timesteps": params.n_timesteps,
            },
        )

    # Snapshot the initial state as epoch-0 so windowed averaging over
    # (epoch-0, epoch-N] is defined for every N >= 1: round 4's held-out
    # drive lost three trained GAN models because --gan-avg == --gan-epochs
    # needed a nonexistent epoch-0.ckpt at export time.
    if params.start_epoch == 1 and not (params.exp_dir / "epoch-0.ckpt").exists():
        save_epoch(0)

    for epoch in range(params.start_epoch, params.num_epochs + 1):
        if resume_sampler is not None and epoch == params.start_epoch:
            _, rng_py = restore_sampler_state(resume_sampler, train_dls)
            resume_sampler = None
        else:
            for dl in train_dls:
                dl.set_epoch(epoch)
            rng_py = random.Random(params.seed + epoch)
        iters = [iter(dl) for dl in train_dls]
        tot_g = MetricsTracker()
        tot_d = MetricsTracker()
        batch_idx = 0
        while True:
            dl_idx = rng_py.choices(range(len(iters)), weights=dls_weights, k=1)[0]
            try:
                batch = next(iters[dl_idx])
            except StopIteration:
                logging.info(f"Reach end of dataloader {dl_idx}")
                break
            batch_idx += 1
            params.batch_idx_train += 1
            n = batch["audio"].shape[0]
            device_batch = shard_batch(
                {"audio": batch["audio"], "audio_lens": batch["audio_lens"]}, mesh
            )

            if params.profile_dir and params.batch_idx_train == 10:
                jax.profiler.start_trace(params.profile_dir)
            if params.train_disc:
                state, metrics = call_with_compile_retry(
                    d_step, state, device_batch, step_rng
                )
                loss_val = float(metrics["loss_d"])
                info = MetricsTracker()
                info["samples"] = n
                for k in ("loss_d", "disc_loss_mp", "disc_loss_mr"):
                    info[k] = float(metrics[k]) * n
                tot_d = tot_d + info
                if params.batch_idx_train >= params.gen_start_batch_idx:
                    params.train_disc = False
            else:
                state, metrics = call_with_compile_retry(
                    g_step, state, device_batch, step_rng
                )
                loss_val = float(metrics["loss_g"])
                info = MetricsTracker()
                info["samples"] = n
                for k in (
                    "loss_g",
                    "gen_loss_mp",
                    "gen_loss_mr",
                    "feat_map_loss_mp",
                    "feat_map_loss_mr",
                    "mel_recon_loss",
                ):
                    info[k] = float(metrics[k]) * n
                tot_g = tot_g + info
                params.train_disc = True

            if diag is not None:
                _, inter = generator.apply(
                    {"params": state.params_g},
                    cond_fn(device_batch["audio"]),
                    n_timesteps=params.n_timesteps,
                    method="infer",
                    rngs={"noise": step_rng},
                    capture_intermediates=True,
                    mutable=["intermediates"],
                )
                diag.collect_intermediates(inter["intermediates"])
                diag.collect_params(state.params_g)
                # backward-side tables through the full G objective
                # (rollout + discriminators + mel-recon): per-module
                # grad_output and per-param param_grad stats (reference
                # diagnostics.py:129 `{module}.grad` / `{param}.param_grad`)
                if diag_backward is None:
                    from flow2gan_tpu.training.diagnostics import (
                        BackwardTables,
                    )

                    diag_g_loss, diag_rollout_perts = _make_diag_objective(
                        generator, discriminators, cond_fn, mel_recon_fns,
                        scales, n_timesteps=params.n_timesteps,
                        remat_rollout=params.remat_rollout,
                    )

                    def _diag_init(
                        _pg=state.params_g, _b=device_batch, _r=step_rng
                    ):
                        # BackwardTables calls this once under its
                        # output_perturbations interceptor
                        return diag_rollout_perts(_pg, _b, _r)

                    diag_backward = BackwardTables(
                        init_fn=_diag_init,
                        loss_fn=lambda pg, perts, pd, batch, rng: diag_g_loss(
                            pg, pd, batch, rng,
                            extra_vars_g={"perturbations": perts},
                        )[0],
                    )
                diag_backward.collect(
                    diag, state.params_g, state.params_d, device_batch, step_rng
                )
                if batch_idx == 5:
                    diag.print_diagnostics()
                    # act-vs-grad histograms for the nonlinearities through
                    # the G objective (reference ScalarDiagnostic,
                    # diagnostics.py:337-511) — pretrain parity
                    _run_scalar_diagnostics(
                        generator, discriminators, cond_fn, mel_recon_fns,
                        params, scales, state, device_batch, step_rng,
                    )
                    logging.info("Diagnostics done, exiting")
                    return

            if params.profile_dir and params.batch_idx_train == 15:
                jax.block_until_ready(
                    metrics.get("loss_d", metrics.get("loss_g"))
                )
                jax.profiler.stop_trace()
                logging.info(f"Profiler trace written to {params.profile_dir}")

            was_d_step = "loss_d" in metrics
            clip_scale_val = float(
                (state.opt_d if was_d_step else state.opt_g).clip_scale
            )
            if clip_scale_val == 0.0 and params.inf_check:
                # reference show_dominant_parameters on BOTH optimizers
                # (ref bin/finetune.py:633-656): when an update is clipped
                # to zero, say WHICH parameter's gradient dominated.
                if debug_grad_fns is None:
                    debug_grad_fns = make_gan_grad_fns(
                        generator, discriminators, cond_fn, mel_recon_fns,
                        n_timesteps=params.n_timesteps, scales=scales,
                        remat_rollout=params.remat_rollout,
                    )
                grad_d_fn, grad_g_fn = debug_grad_fns
                dbg_rng = jax.random.fold_in(step_rng, int(state.batch_idx) - 1)
                if was_d_step:
                    bad_grads = grad_d_fn(
                        state.params_d, state.params_g, device_batch, dbg_rng
                    )
                    rms = state.opt_d.param_rms
                else:
                    bad_grads = grad_g_fn(
                        state.params_g, state.params_d, device_batch, dbg_rng
                    )
                    rms = state.opt_g.param_rms
                side = "D" if was_d_step else "G"
                for name, prop, grms in dominant_parameters(
                    bad_grads, param_rms=rms
                ):
                    logging.warning(
                        f"Dominant {side} grad: {name} share={prop:.2%} "
                        f"rms={grms:.3g}"
                    )

            def _capture_intermediates():
                _, inter = generator.apply(
                    {"params": state.params_g},
                    cond_fn(device_batch["audio"]),
                    n_timesteps=params.n_timesteps,
                    method="infer",
                    rngs={"noise": step_rng},
                    capture_intermediates=True,
                    mutable=["intermediates"],
                )
                return inter["intermediates"]

            guard.check(
                loss_val,
                clip_scale_val,
                params.batch_idx_train,
                lambda suffix: save_epoch(f"bad{suffix}-{epoch}"),
                # the full-rollout capture replay is --inf-check-only, like
                # pretrain: it materializes every module output of the
                # unrolled Euler graph and can OOM near memory capacity
                intermediates_fn=(
                    _capture_intermediates if params.inf_check else None
                ),
            )

            if (
                jax.process_index() == 0
                and params.batch_idx_train % params.average_period == 0
            ):
                model_avg = ckpt.update_averaged_model(
                    model_avg,
                    jax.tree.map(np.asarray, state.params_g),
                    params.average_period,
                    params.batch_idx_train,
                )

            if (
                jax.process_index() == 0
                and params.batch_idx_train % params.save_every_n == 0
            ):
                ckpt.save_checkpoint_with_global_batch_idx(
                    params.exp_dir,
                    params.batch_idx_train,
                    params={
                        "generator": jax.tree.map(np.asarray, state.params_g),
                        "discriminator": jax.tree.map(np.asarray, state.params_d),
                    },
                    model_avg=model_avg,
                    optimizer_state={
                        "g": jax.tree.map(np.asarray, state.opt_g),
                        "d": jax.tree.map(np.asarray, state.opt_d),
                    },
                    train_params={
                        "batch_idx_train": params.batch_idx_train,
                        "train_disc": params.train_disc,
                    },
                    sampler_state=sampler_state_snapshot(epoch, train_dls, rng_py),
                )
                ckpt.remove_checkpoints(params.exp_dir, topk=params.keep_last_k)

            if params.batch_idx_train % params.log_interval in (0, 1):
                logging.info(
                    f"Epoch {epoch}, batch {batch_idx}, global {params.batch_idx_train}, "
                    f"{'D' if 'loss_d' in metrics else 'G'} loss {loss_val:.4f}; "
                    f"G avg: {tot_g}; D avg: {tot_d}"
                )
                if tb_writer is not None:
                    for k, v in metrics.items():
                        if k != "samples":
                            tb_writer.add_scalar(
                                f"train/{k}", float(v), params.batch_idx_train
                            )

            if (
                params.valid_interval > 0
                and params.batch_idx_train % params.valid_interval == 0
                and valid_dls
            ):
                vinfo = MetricsTracker()
                for dl in valid_dls:
                    for vb in dl:
                        vbd = {
                            "audio": jnp.asarray(vb["audio"]),
                            "audio_lens": jnp.asarray(vb["audio_lens"]),
                        }
                        m = eval_step(
                            state.params_g, state.params_d, shard_batch(vbd, mesh),
                            step_rng,
                        )
                        bn = vb["audio"].shape[0]
                        vinfo["samples"] += bn
                        for k in ("loss_g", "mel_recon_loss"):
                            vinfo[k] += float(m[k]) * bn
                vinfo.reduce()
                logging.info(f"Epoch {epoch}, validation: {vinfo}")
                if tb_writer is not None:
                    vinfo.write_summary(tb_writer, "train/valid_", params.batch_idx_train)
                    save_test_samples(
                        params, generator, state.params_g, mel_fn,
                        test_batch, tb_writer, cond_fn=cond_fn,
                    )

        save_epoch(epoch)
    logging.info("Done!")


def main():
    args = get_parser().parse_args()
    run(args)


if __name__ == "__main__":
    main()
