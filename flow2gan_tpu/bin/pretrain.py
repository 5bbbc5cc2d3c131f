#!/usr/bin/env python3
"""Flow-Matching pretraining (stage 1) on a TPU mesh.

TPU-native re-design of /root/reference/flow2gan/bin/pretrain.py: same CLI
capability surface (multi-dataset weighted sampling, periodic validation with
cross-process reduction, fp64 running-average model, epoch + global-batch
checkpoints with topk retention, TensorBoard scalars + audio/spectrogram
sample dumps, diagnostics mode, inf-check), but one process drives all local
devices — DDP/mp.spawn/GradScaler are replaced by a jitted step over a
`data` mesh.

Usage:
  python -m flow2gan_tpu.bin.pretrain \
    --exp-dir exp/fm --model-name mel_24k_base \
    --train-recordings data/train_recordings.jsonl.gz \
    --valid-recordings data/valid_recordings.jsonl.gz \
    --num-epochs 200 --batch-size 256 --base-lr 0.035
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
from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.ops.tokenizer import load_token_frontend
from flow2gan_tpu.parallel.mesh import (
    host_local,
    make_mesh,
    replicate,
    shard_batch,
)
from flow2gan_tpu.training import checkpoint as ckpt
from flow2gan_tpu.training.diagnostics import (
    DiagnosticsCollector,
    collect_scalar_diagnostics,
    print_scalar_diagnostics,
)
from flow2gan_tpu.training.env import get_env_info
from flow2gan_tpu.training.err import (
    call_with_compile_retry,
    raise_nonfinite_loss_error,
)
from flow2gan_tpu.training.hooks import NonfiniteLossGuard, find_nonfinite_leaves
from flow2gan_tpu.training.optim import (
    dominant_parameters,
    eden2_lr,
    make_lr_scale_tree,
    parse_lr_scale_rules,
    scaled_adam,
)
from flow2gan_tpu.training.train_step import (
    TrainState,
    init_train_state,
    make_fm_eval_step,
    make_fm_grad_fn,
    make_fm_train_step,
)
from flow2gan_tpu.utils import (
    AttributeDict,
    MetricsTracker,
    enable_compilation_cache,
    plot_feature,
    setup_logger,
    str2bool,
    tb_add_audio,
    to_float_tuple,
    to_int_tuple,
)


def get_parser():
    parser = argparse.ArgumentParser(
        description="Flow-Matching pretraining (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-dir", type=Path, default=Path("exp/fm"))
    parser.add_argument("--model-name", type=str, default="mel_24k_base")
    parser.add_argument("--tokenizer", type=str, default=None,
                        help="k-means codebook .npz for token_* configs "
                        "(scripts/train_tokenizer.py); the frozen pseudo-codec "
                        "that conditions TokenAudioGenerator")
    parser.add_argument("--num-epochs", type=int, default=200)
    parser.add_argument("--start-epoch", type=int, default=1,
                        help="Resume from epoch-{start-epoch-1}.ckpt when > 1")
    parser.add_argument("--base-lr", type=float, default=0.035)
    parser.add_argument("--lr-batches", type=float, default=7500)
    parser.add_argument("--warmup-batches", type=float, default=500,
                        help="Eden2 linear-warmup length in batches")
    parser.add_argument("--warmup-start", type=float, default=0.1,
                        help="Eden2 warmup starting fraction (the reference "
                        "trainer passes 0.1, ref bin/pretrain.py:799, "
                        "overriding the scheduler-class default of 0.5)")
    parser.add_argument("--batch-size", type=int, default=256,
                        help="GLOBAL batch size (split over devices)")
    parser.add_argument("--duration", type=float, default=1.5,
                        help="Training crop length in seconds")
    parser.add_argument("--max-load-times", type=int, default=3)
    parser.add_argument("--train-recordings", type=str, required=False,
                        help="CSV of recordings.jsonl[.gz] manifests")
    parser.add_argument("--train-dls-weights", type=str, default=None,
                        help="CSV of sampling weights, one per train manifest")
    parser.add_argument("--valid-recordings", type=str, required=False)
    parser.add_argument("--test-recordings", type=str, default=None,
                        help="recordings.jsonl[.gz] manifest of full-length "
                        "test samples dumped to TensorBoard at each "
                        "validation (reference bin/pretrain.py:722; falls "
                        "back to the first validation batch when unset). "
                        "The first loader batch (<=8 samples) is dumped.")
    parser.add_argument("--save-infer-steps", type=str, default="2,4,8",
                        help="Euler step counts for the TB test-sample "
                        "dumps, comma-separated (reference "
                        "--save-infer-steps, bin/pretrain.py:213)")
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--print-diagnostics", type=str2bool, default=False)
    parser.add_argument("--inf-check", type=str2bool, default=False)
    parser.add_argument("--save-every-n", type=int, default=4000,
                        help="Save checkpoint-{global_batch}.ckpt every N batches")
    parser.add_argument("--keep-last-k", type=int, default=30)
    parser.add_argument("--average-period", type=int, default=200)
    parser.add_argument("--log-interval", type=int, default=50)
    parser.add_argument("--valid-interval", type=int, default=2000)
    parser.add_argument("--use-bf16", type=str2bool, default=False,
                        help="bf16 activations in the model compute path")
    parser.add_argument("--tensorboard", type=str2bool, default=True)
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of batches 10-15 "
                        "into this directory (view with TensorBoard)")
    parser.add_argument("--freeze-modules", type=str, default=None,
                        help="CSV of param-path prefixes to freeze (lr 0), "
                        "e.g. 'cond_encoder,estimators_0' (reference "
                        "get_parameter_groups_with_lrs freeze_modules)")
    parser.add_argument("--lr-scale-rules", type=str, default=None,
                        help="CSV of prefix=scale per-module lr multipliers, "
                        "e.g. 'cond_encoder=0.5' (reference lr_scale attrs)")
    parser.add_argument("--resume-from", type=str, default=None,
                        help="Mid-epoch resume from a checkpoint-<N>.ckpt "
                        "written by --save-every-n; restores the sampler "
                        "position so the data stream continues, not replays "
                        "(reference persists the lhotse sampler, "
                        "checkpoint.py:40-108)")
    return parser


def get_train_params(args) -> AttributeDict:
    params = AttributeDict(
        {
            "batch_idx_train": 0,
            "best_valid_loss": float("inf"),
            "best_valid_epoch": 0,
            "env_info": get_env_info(),
        }
    )
    params.update(vars(args))
    return params


def load_manifests(csv: str):
    if not csv:
        raise SystemExit(
            "--train-recordings is required: a comma-separated list of "
            "recordings.jsonl[.gz] manifests (scripts/prepare_*_libritts.py)"
        )
    recs_list = []
    for path in csv.split(","):
        recs_list.append(read_recording_manifest(path))
    return recs_list


def sampler_state_snapshot(epoch, train_dls, rng_py):
    """Everything the epoch loop needs to continue mid-epoch: per-loader
    positions plus the weighted-dataloader-choice RNG state."""
    st = rng_py.getstate()
    return {
        "epoch": epoch,
        "dl_states": [dl.state_dict() for dl in train_dls],
        "rng_py": {"version": st[0], "state": list(st[1]), "gauss": st[2]},
    }


def _as_list(x):
    """msgpack checkpoints store python lists as {"0": ..., "1": ...} dicts
    (flax to_state_dict); accept both forms."""
    if isinstance(x, dict):
        return [x[k] for k in sorted(x, key=int)]
    return list(x)


def restore_sampler_state(snapshot, train_dls):
    import random as _random

    for dl, st in zip(train_dls, _as_list(snapshot["dl_states"])):
        dl.load_state_dict(st)
    rng_py = _random.Random()
    r = snapshot["rng_py"]
    rng_py.setstate((int(r["version"]),
                     tuple(int(x) for x in _as_list(r["state"])),
                     None if r["gauss"] is None else float(r["gauss"])))
    return int(snapshot["epoch"]), rng_py


def compute_validation_loss(params, eval_step, state, valid_dls, mesh, rng):
    tot = MetricsTracker()
    for dl in valid_dls:
        for batch in dl:
            b = {
                "audio": jnp.asarray(batch["audio"]),
                "audio_lens": jnp.asarray(batch["audio_lens"]),
            }
            b = shard_batch(b, mesh) if mesh is not None else b
            loss = eval_step(state.params, b, rng)
            n = batch["audio"].shape[0]
            tot["loss"] += float(loss) * n
            tot["samples"] += n
    tot.reduce()
    return tot


def save_test_samples(params, model, gen_params, mel_fn, test_batch, tb_writer,
                      cond_fn=None):
    """Generate audio per params.save_infer_steps for every test sample and
    dump audio + mel-spectrogram images to TB (reference bin/pretrain.py:608-680,
    tags valid/test_audio_{i}_gt / valid/test_audio_{i}_step_{k}). Shared by
    finetune, which dumps at its trained step count (ref bin/finetune.py:779-845).
    `gen_params` is the generator's parameter pytree. `cond_fn` (default
    mel_fn) computes the model conditioning; mel_fn always renders the
    spectrogram images."""
    if tb_writer is None or test_batch is None:
        return
    audio = jnp.asarray(test_batch["audio"])
    lens = np.asarray(test_batch["audio_lens"])
    cond = (cond_fn or mel_fn)(audio)
    sr = params.sampling_rate
    step_idx = params.batch_idx_train
    # Multi-host: this runs on process 0 only, so the apply below must be a
    # process-local program — extract an addressable copy of the (replicated)
    # global params instead of feeding mesh-spanning arrays into it.
    local_params = host_local(gen_params)

    def dump(tag, wav):
        tb_add_audio(tb_writer, tag, wav, step_idx, sr)
        mel_img = np.asarray(mel_fn(jnp.asarray(wav[None])))[0]
        tb_writer.add_image(
            f"{tag}_spec", plot_feature(mel_img), step_idx, dataformats="HWC"
        )

    # Ground truth is constant across validations — dump it once (the
    # reference re-writes it every call, ref bin/pretrain.py:654-663; that
    # bloats the event file with duplicate audio/images over a long run).
    if not getattr(params, "_gt_samples_dumped", False):
        gt = np.asarray(audio)
        for i in range(gt.shape[0]):
            dump(f"valid/test_audio_{i}_gt", gt[i, : lens[i]])
        params._gt_samples_dumped = True
    for n_steps in to_int_tuple(params.save_infer_steps):
        wav = model.apply(
            {"params": local_params},
            cond,
            audio_lens=jnp.asarray(test_batch["audio_lens"]),
            n_timesteps=n_steps,
            clamp_pred=True,
            # keep the compiled program one loop body at depth > 1 (long
            # padded audio unrolled k times compiles very slowly on chip)
            scan_solve=n_steps > 1,
            method="infer",
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        wav = np.asarray(wav)
        for i in range(wav.shape[0]):
            dump(f"valid/test_audio_{i}_step_{n_steps}", wav[i, : lens[i]])


def run(args):
    params = get_train_params(args)
    params.exp_dir = Path(params.exp_dir)
    params.exp_dir.mkdir(parents=True, exist_ok=True)
    setup_logger(
        f"{params.exp_dir}/log/log-train",
        rank=jax.process_index(),
        world_size=jax.process_count(),
    )
    enable_compilation_cache()
    logging.info("Training started")
    logging.info(params)

    random.seed(params.seed)
    np.random.seed(params.seed)

    cfg = get_generator_config(params.model_name)
    if params.use_bf16:
        cfg["compute_dtype"] = "bfloat16"
    params.sampling_rate = cfg.sampling_rate
    model = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate,
        n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length,
        n_mels=cfg.n_mels,
    )
    # cond_fn is the audio -> conditioning frontend fed to the model on
    # device inside the step; mel_fn stays for TB spectrogram images. For
    # token configs it's the frozen k-means pseudo-codec (ops/tokenizer.py).
    cond_fn = (
        load_token_frontend(cfg, params.tokenizer, params.model_name)
        or mel_fn
    )

    mesh = make_mesh(("data",))
    n_dev = jax.device_count()
    assert params.batch_size % n_dev == 0, (params.batch_size, n_dev)
    # --batch-size is GLOBAL. The DataLoader shards recordings per process
    # and shard_batch assembles the global batch from each host's local
    # arrays, so each process must load batch_size / process_count items.
    n_proc = jax.process_count()
    assert params.batch_size % n_proc == 0, (params.batch_size, n_proc)
    local_batch = params.batch_size // n_proc

    # ---- data
    fixed_len = int(params.duration * cfg.sampling_rate)
    train_recs = load_manifests(params.train_recordings)
    train_dls = [
        build_data_loader(
            recs,
            sampling_rate=cfg.sampling_rate,
            batch_size=local_batch,
            num_workers=params.num_workers,
            train=True,
            duration=params.duration,
            max_load_times=params.max_load_times,
            seed=params.seed,
            drop_last=True,
        )
        for recs in train_recs
    ]
    if params.train_dls_weights:
        dls_weights = list(to_float_tuple(params.train_dls_weights))
        assert len(dls_weights) == len(train_dls)
    else:
        dls_weights = [1.0] * len(train_dls)

    valid_dls = []
    if params.valid_recordings:
        valid_dls = [
            build_data_loader(
                recs,
                sampling_rate=cfg.sampling_rate,
                batch_size=min(local_batch, 32),
                num_workers=params.num_workers,
                train=False,
                duration=params.duration,
            )
            for recs in load_manifests(params.valid_recordings)
        ]
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

    # ---- model / optimizer state
    rng = jax.random.PRNGKey(params.seed)
    example = {
        "audio": jnp.zeros((2, fixed_len), jnp.float32),
        "audio_lens": jnp.full((2,), fixed_len, jnp.int32),
    }
    variables = model.init(
        {"params": rng, "noise": rng, "gate": rng, "dropout": rng},
        cond_fn(example["audio"]),
        example["audio"],
        example["audio_lens"],
        train=True,
    )
    init_params = variables["params"]
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(init_params))
    logging.info(f"Number of model parameters: {n_params}")

    optimizer = scaled_adam(clipping_scale=2.0)
    lr_fn = lambda b: eden2_lr(
        params.base_lr, b, params.lr_batches,
        warmup_batches=params.warmup_batches,
        warmup_start=params.warmup_start,
    )
    rules = parse_lr_scale_rules(params.lr_scale_rules, params.freeze_modules)
    lr_scale = make_lr_scale_tree(init_params, rules) if rules else None
    if rules:
        logging.info(f"Per-module lr scale rules: {rules}")
    train_step = make_fm_train_step(
        model, optimizer, lr_fn, mel_fn=cond_fn, lr_scale=lr_scale
    )
    eval_step = make_fm_eval_step(model, mel_fn=cond_fn)
    debug_grad_fn = None  # built lazily on first hard-clip (inf-check only)

    state = init_train_state(replicate(init_params, mesh), optimizer)
    model_avg = jax.tree.map(lambda x: np.asarray(x, np.float64), init_params)

    # ---- resume
    if params.start_epoch > 1:
        resume = params.exp_dir / f"epoch-{params.start_epoch - 1}.ckpt"
        if resume.exists():
            logging.info(f"Resuming from {resume}")
            loaded = ckpt.load_checkpoint(resume)
            state = TrainState(
                params=replicate(
                    ckpt.restore_params(init_params, loaded["model"]), mesh
                ),
                opt_state=ckpt.restore_params(
                    jax.tree.map(np.asarray, state.opt_state), loaded["optimizer"]
                )
                if loaded.get("optimizer") is not None
                else state.opt_state,
                batch_idx=jnp.asarray(loaded.get("batch_idx_train", 0), jnp.int32),
            )
            if loaded.get("model_avg") is not None:
                model_avg = ckpt.restore_params(model_avg, loaded["model_avg"])
            params.batch_idx_train = int(loaded.get("batch_idx_train", 0))
        else:
            logging.warning(f"No checkpoint {resume}; starting fresh")

    resume_sampler = None
    if params.resume_from:
        resume = Path(params.resume_from)
        logging.info(f"Mid-epoch resume from {resume}")
        loaded = ckpt.load_checkpoint(resume)
        state = TrainState(
            params=replicate(
                ckpt.restore_params(init_params, loaded["model"]), mesh
            ),
            opt_state=ckpt.restore_params(
                jax.tree.map(np.asarray, state.opt_state), loaded["optimizer"]
            )
            if loaded.get("optimizer") is not None
            else state.opt_state,
            batch_idx=jnp.asarray(loaded.get("batch_idx_train", 0), jnp.int32),
        )
        if loaded.get("model_avg") is not None:
            model_avg = ckpt.restore_params(model_avg, loaded["model_avg"])
        params.batch_idx_train = int(loaded.get("batch_idx_train", 0))
        if loaded.get("sampler") is not None:
            resume_sampler = loaded["sampler"]
            params.start_epoch = int(resume_sampler["epoch"])
            logging.info(
                f"Sampler restored: epoch {params.start_epoch}, consumed "
                f"{[d['consumed'] for d in _as_list(resume_sampler['dl_states'])]}"
            )

    tb_writer = None
    if params.tensorboard and jax.process_index() == 0:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(log_dir=f"{params.exp_dir}/tensorboard")

    diag = DiagnosticsCollector() if params.print_diagnostics else None
    diag_backward = None  # BackwardTables, built on first diagnostics batch

    def save_bad_model(suffix=""):
        ckpt.save_checkpoint(
            params.exp_dir / f"bad-model{suffix}.ckpt",
            params=jax.tree.map(np.asarray, state.params),
            model_avg=model_avg,
            optimizer_state=jax.tree.map(np.asarray, state.opt_state),
            train_params={"batch_idx_train": params.batch_idx_train},
        )

    step_rng = jax.random.PRNGKey(params.seed + 1)
    guard = NonfiniteLossGuard()

    # Snapshot the initial state as epoch-0 so windowed averaging over
    # (epoch-0, epoch-N] is defined for every N >= 1: --avg == --epochs
    # previously needed a nonexistent epoch-0.ckpt and failed the export
    # (save_averaged_model window semantics, reference checkpoint.py:442-501).
    epoch0 = params.exp_dir / "epoch-0.ckpt"
    if (
        params.start_epoch == 1
        and jax.process_index() == 0
        and not epoch0.exists()
    ):
        ckpt.save_checkpoint(
            epoch0,
            params=jax.tree.map(np.asarray, state.params),
            model_avg=model_avg,
            train_params={
                "batch_idx_train": params.batch_idx_train,
                "model_name": params.model_name,
            },
        )

    for epoch in range(params.start_epoch, params.num_epochs + 1):
        if resume_sampler is not None and epoch == params.start_epoch:
            _, rng_py = restore_sampler_state(resume_sampler, train_dls)
            resume_sampler = None
        else:
            for dl in train_dls:
                dl.set_epoch(epoch)
            rng_py = random.Random(params.seed + epoch)
        iters = [iter(dl) for dl in train_dls]
        tot_losses = [MetricsTracker() for _ in train_dls]

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
            n_samples = batch["audio"].shape[0]

            device_batch = shard_batch(
                {
                    "audio": batch["audio"],
                    "audio_lens": batch["audio_lens"],
                },
                mesh,
            )
            if params.profile_dir and params.batch_idx_train == 10:
                jax.profiler.start_trace(params.profile_dir)
            state, metrics = call_with_compile_retry(
                train_step, state, device_batch, step_rng
            )
            if params.profile_dir and params.batch_idx_train == 15:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                logging.info(f"Profiler trace written to {params.profile_dir}")

            if params.print_diagnostics:
                # re-run forward with intermediates captured (few batches)
                _, inter = model.apply(
                    {"params": state.params},
                    cond_fn(device_batch["audio"]),
                    device_batch["audio"],
                    device_batch["audio_lens"],
                    train=False,
                    rngs={"noise": step_rng},
                    capture_intermediates=True,
                    mutable=["intermediates"],
                )
                diag.collect_intermediates(inter["intermediates"])
                diag.collect_params(state.params)
                # backward-side tables: per-module grad_output and per-param
                # param_grad stats (reference diagnostics.py:129 tag taxonomy
                # `{module}.grad` / `{param}.param_grad`), via one vjp through
                # per-module-output zero perturbations
                if diag_backward is None:
                    from flow2gan_tpu.training.diagnostics import (
                        BackwardTables,
                    )

                    def _diag_fwd(p, perts, cond, audio, lens, rng,
                                  mutable=False):
                        variables = {"params": p}
                        if perts is not None:
                            variables["perturbations"] = perts
                        return model.apply(
                            variables,
                            cond,
                            audio,
                            lens,
                            train=True,
                            rngs={
                                "noise": rng,
                                "gate": jax.random.fold_in(rng, 1),
                                "dropout": jax.random.fold_in(rng, 2),
                            },
                            **({"mutable": ["perturbations"]} if mutable else {}),
                        )

                    diag_backward = BackwardTables(
                        init_fn=lambda: _diag_fwd(
                            state.params, None,
                            cond_fn(device_batch["audio"]),
                            device_batch["audio"],
                            device_batch["audio_lens"],
                            step_rng, mutable=True,
                        )[1]["perturbations"],
                        loss_fn=_diag_fwd,
                    )
                diag_backward.collect(
                    diag,
                    state.params,
                    cond_fn(device_batch["audio"]),
                    device_batch["audio"],
                    device_batch["audio_lens"],
                    step_rng,
                )
                if batch_idx == 5:
                    diag.print_diagnostics()
                    # nonlinearity activation-vs-gradient histograms
                    # (reference ScalarDiagnostic, diagnostics.py:337-511)
                    from flow2gan_tpu.models import norms as _norms

                    scalar_stats = {}
                    with _norms.diagnostic_perturbations():
                        cond0 = cond_fn(device_batch["audio"])
                        srng = jax.random.fold_in(step_rng, 999)
                        pvars = model.init(
                            {"params": srng, "noise": srng,
                             "gate": srng, "dropout": srng},
                            cond0,
                            device_batch["audio"],
                            device_batch["audio_lens"],
                            train=True,
                        )
                        perts = jax.tree.map(
                            jnp.zeros_like, pvars["perturbations"]
                        )

                        def ploss(p):
                            out, mut = model.apply(
                                {"params": state.params, "perturbations": p},
                                cond0,
                                device_batch["audio"],
                                device_batch["audio_lens"],
                                train=True,
                                rngs={
                                    "noise": jax.random.fold_in(srng, 0),
                                    "gate": jax.random.fold_in(srng, 1),
                                    "dropout": jax.random.fold_in(srng, 2),
                                },
                                capture_intermediates=(
                                    lambda m, _: type(m).__name__ == "PReLU"
                                ),
                                mutable=["intermediates"],
                            )
                            return out, mut["intermediates"]

                        (_, inter2), pgrads = jax.value_and_grad(
                            ploss, has_aux=True
                        )(perts)
                    collect_scalar_diagnostics(scalar_stats, inter2, pgrads)
                    print_scalar_diagnostics(scalar_stats)
                    logging.info("Diagnostics done, exiting")
                    return

            loss_val = float(metrics["loss"])
            loss_info = MetricsTracker()
            loss_info["samples"] = n_samples
            loss_info["loss"] = loss_val * n_samples
            tot_losses[dl_idx] = tot_losses[dl_idx] + loss_info

            clip_scale_val = float(metrics["clip_scale"])
            if clip_scale_val == 0.0 and params.inf_check:
                # reference show_dominant_parameters (optim.py:608,670-734):
                # when the whole batch is clipped away, say WHICH parameter's
                # gradient dominated the norm.
                if debug_grad_fn is None:
                    debug_grad_fn = make_fm_grad_fn(model, mel_fn=cond_fn)
                # replay with the SAME noise draw as the clipped step:
                # train_step folds with the pre-increment state.batch_idx
                # (train_step.py:82), which after the step is batch_idx - 1
                bad_grads = debug_grad_fn(
                    state.params,
                    device_batch,
                    jax.random.fold_in(step_rng, int(state.batch_idx) - 1),
                )
                for name, prop, grms in dominant_parameters(
                    bad_grads, param_rms=state.opt_state.param_rms
                ):
                    logging.warning(
                        f"Dominant grad: {name} share={prop:.2%} rms={grms:.3g}"
                    )
            def _capture_intermediates():
                # replay the forward on the offending batch with every
                # module output tapped, to name where the inf was born
                _, inter = model.apply(
                    {"params": state.params},
                    cond_fn(device_batch["audio"]),
                    device_batch["audio"],
                    device_batch["audio_lens"],
                    train=False,
                    rngs={"noise": step_rng},
                    capture_intermediates=True,
                    mutable=["intermediates"],
                )
                return inter["intermediates"]

            guard.check(
                loss_val,
                clip_scale_val,
                params.batch_idx_train,
                save_bad_model,
                params_tree=state.params if params.inf_check else None,
                intermediates_fn=_capture_intermediates if params.inf_check else None,
            )

            if (
                jax.process_index() == 0
                and params.batch_idx_train % params.average_period == 0
            ):
                model_avg = ckpt.update_averaged_model(
                    model_avg,
                    jax.tree.map(np.asarray, state.params),
                    params.average_period,
                    params.batch_idx_train,
                )

            if (
                params.batch_idx_train % params.save_every_n == 0
                and jax.process_index() == 0
            ):
                ckpt.save_checkpoint_with_global_batch_idx(
                    params.exp_dir,
                    params.batch_idx_train,
                    params=jax.tree.map(np.asarray, state.params),
                    model_avg=model_avg,
                    optimizer_state=jax.tree.map(np.asarray, state.opt_state),
                    train_params={"batch_idx_train": params.batch_idx_train},
                    sampler_state=sampler_state_snapshot(epoch, train_dls, rng_py),
                )
                ckpt.remove_checkpoints(params.exp_dir, topk=params.keep_last_k)

            if params.batch_idx_train % params.log_interval == 0:
                cur = tot_losses[dl_idx]
                logging.info(
                    f"Epoch {epoch}, batch {batch_idx} (dl {dl_idx}), "
                    f"global {params.batch_idx_train}, "
                    f"loss {loss_val:.4f}, avg {cur}"
                    f", lr {float(metrics['lr']):.2e}"
                    f", clip {float(metrics['clip_scale']):.3f}"
                )
                if tb_writer is not None:
                    tb_writer.add_scalar(
                        f"train/current_loss_{dl_idx}", loss_val, params.batch_idx_train
                    )
                    tb_writer.add_scalar(
                        "train/learning_rate", float(metrics["lr"]), params.batch_idx_train
                    )
                    cur.write_summary(
                        tb_writer, f"train/tot_loss_{dl_idx}_", params.batch_idx_train
                    )

            if (
                params.valid_interval > 0
                and params.batch_idx_train % params.valid_interval == 0
                and valid_dls
            ):
                logging.info("Computing validation loss")
                valid_info = compute_validation_loss(
                    params, eval_step, state, valid_dls, mesh, step_rng
                )
                valid_loss = (
                    valid_info["loss"] / valid_info["samples"]
                    if valid_info["samples"]
                    else float("inf")
                )
                if valid_loss < params.best_valid_loss:
                    params.best_valid_loss = valid_loss
                    params.best_valid_epoch = epoch
                logging.info(
                    f"Epoch {epoch}, validation: {valid_info} "
                    f"(best {params.best_valid_loss:.4g} "
                    f"@ epoch {params.best_valid_epoch})"
                )
                # device memory observability (reference logs
                # cuda.max_memory_allocated each validation, pretrain.py:565)
                try:
                    stats = jax.local_devices()[0].memory_stats() or {}
                    logging.info(
                        "Device memory: "
                        f"{stats.get('bytes_in_use', 0) / 1e9:.2f} GB in use, "
                        f"peak {stats.get('peak_bytes_in_use', 0) / 1e9:.2f} GB"
                    )
                except Exception:
                    pass
                if tb_writer is not None:
                    valid_info.write_summary(
                        tb_writer, "train/valid_", params.batch_idx_train
                    )
                    save_test_samples(
                        params, model, state.params, mel_fn, test_batch,
                        tb_writer, cond_fn=cond_fn,
                    )

        # ---- end of epoch: checkpoint
        if jax.process_index() == 0:
            ckpt.save_checkpoint(
                params.exp_dir / f"epoch-{epoch}.ckpt",
                params=jax.tree.map(np.asarray, state.params),
                model_avg=model_avg,
                optimizer_state=jax.tree.map(np.asarray, state.opt_state),
                scheduler_state={"batch": params.batch_idx_train, "epoch": epoch},
                train_params={
                    "batch_idx_train": params.batch_idx_train,
                    "env_info": params.env_info,
                    "model_name": params.model_name,
                    "base_lr": params.base_lr,
                },
            )
    logging.info("Done!")


def main():
    args = get_parser().parse_args()
    run(args)


if __name__ == "__main__":
    main()
