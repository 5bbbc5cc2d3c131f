"""Golden tests: JAX ScaledAdam / Eden2 vs the reference torch implementation
(/root/reference/flow2gan/optim.py), run side by side on identical parameters
and synthetic gradients for 260 steps — crossing every clipping-threshold
recalibration boundary (10/20/40/100/200) and many size-update periods.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from flow2gan_tpu.training.optim import eden2_lr, make_eden2, scaled_adam

from .reference_stubs import import_reference

SHAPES = {
    "w1": (6, 5),
    "w2": (6, 5),  # same shape as w1: exercises the reference's batching path
    "b1": (6,),
    "scalar": (),
    "deep": (3, 4, 2),
}
N_STEPS = 260
BASE_LR = 0.045
LR_BATCHES = 75.0


def _make_inputs():
    rng = np.random.RandomState(0)
    def randn(s, scale=1.0):
        return np.asarray(rng.randn(*s) * scale, dtype=np.float32).reshape(s)

    params = {k: randn(s, 0.5) for k, s in SHAPES.items()}
    # occasional large-gradient spikes to exercise clipping
    grads = []
    for i in range(N_STEPS):
        g = {k: randn(s) for k, s in SHAPES.items()}
        if i % 37 == 5:
            g = {k: np.asarray(v * 25.0, dtype=np.float32).reshape(v.shape) for k, v in g.items()}
        grads.append(g)
    return params, grads


@pytest.fixture(scope="module")
def torch_trajectory(reference_dir):
    import_reference()
    from flow2gan.optim import Eden2, ScaledAdam

    params0, grads = _make_inputs()
    tparams = {
        k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in params0.items()
    }
    opt = ScaledAdam(
        [(k, p) for k, p in tparams.items()],
        lr=BASE_LR,
        clipping_scale=2.0,
    )
    sched = Eden2(opt, lr_batches=LR_BATCHES)
    snaps = {}
    for i, g in enumerate(grads):
        sched.step_batch(i)  # lr for this step
        for k, p in tparams.items():
            p.grad = torch.from_numpy(g[k].copy())
        opt.step()
        opt.zero_grad()
        if i + 1 in (1, 5, 11, 50, 101, N_STEPS):
            snaps[i + 1] = {k: p.detach().numpy().copy() for k, p in tparams.items()}
    return params0, grads, snaps


def test_scaled_adam_matches_reference(torch_trajectory):
    params0, grads, torch_snaps = torch_trajectory
    opt = scaled_adam(clipping_scale=2.0)
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    state = opt.init(params)

    @jax.jit
    def step_fn(params, state, g, lr):
        updates, state = opt.update(g, state, params, lr=lr)
        return optax.apply_updates(params, updates), state

    for i, g in enumerate(grads):
        lr = eden2_lr(BASE_LR, i, LR_BATCHES)
        params, state = step_fn(params, state, {k: jnp.asarray(v) for k, v in g.items()}, lr)
        if i + 1 in torch_snaps:
            for k in params:
                ours = np.asarray(params[k])
                theirs = torch_snaps[i + 1][k]
                scale = np.abs(theirs).max() + 1e-8
                err = np.abs(ours - theirs).max() / scale
                assert err < 2e-4, f"step {i+1} param {k}: rel err {err}"


def test_eden2_matches_reference(reference_dir):
    import_reference()
    from flow2gan.optim import Eden2, ScaledAdam

    p = torch.nn.Parameter(torch.zeros(3))
    opt = ScaledAdam([p], lr=0.035)
    sched = Eden2(opt, lr_batches=7500)
    for batch in [0, 1, 100, 499, 500, 501, 5000, 7500, 100000]:
        sched.step_batch(batch)
        theirs = opt.param_groups[0]["lr"]
        ours = float(eden2_lr(0.035, batch, 7500))
        assert abs(ours - theirs) / theirs < 1e-6, (batch, ours, theirs)


def test_trainer_wired_lr_matches_reference_trainers(reference_dir):
    """Golden-compare the lr AS THE TRAINERS CONSTRUCT IT against a reference
    scheduler constructed as the reference trainers construct it.

    The reference trainers pass warmup_start=0.1 explicitly (ref
    bin/pretrain.py:799, bin/finetune.py:918-921) — NOT the Eden2 class
    default of 0.5 — so a component-golden test at class defaults cannot
    catch a trainer-wiring deviation. This one reads the actual parser
    defaults of both our trainers and compares through warmup.
    """
    import_reference()
    from flow2gan.optim import Eden2, ScaledAdam

    from flow2gan_tpu.bin.pretrain import get_parser as pretrain_parser
    from flow2gan_tpu.bin.finetune import get_parser as finetune_parser

    pt = pretrain_parser().parse_args([])
    ft = finetune_parser().parse_args([])

    cases = [
        # (base_lr, lr_batches, our warmup_start, our warmup_batches)
        (pt.base_lr, pt.lr_batches, pt.warmup_start, pt.warmup_batches),
        (ft.lr_g, ft.lr_batches_g, ft.warmup_start, ft.warmup_batches),
        (ft.lr_d, ft.lr_batches_d, ft.warmup_start, ft.warmup_batches),
    ]
    for base_lr, lr_batches, w_start, w_batches in cases:
        p = torch.nn.Parameter(torch.zeros(3))
        opt = ScaledAdam([p], lr=base_lr)
        # constructed exactly as the reference trainers do
        sched = Eden2(opt, lr_batches=lr_batches, warmup_start=0.1)
        for batch in [0, 100, 250, 499, 500]:
            sched.step_batch(batch)
            theirs = opt.param_groups[0]["lr"]
            ours = float(
                eden2_lr(base_lr, batch, lr_batches,
                         warmup_batches=w_batches, warmup_start=w_start)
            )
            assert abs(ours - theirs) / theirs < 1e-6, (
                f"lr mismatch at batch {batch}: ours={ours} ref={theirs} "
                f"(base_lr={base_lr}, lr_batches={lr_batches})"
            )


def test_scheduler_wrapper_state_roundtrip():
    s = make_eden2(0.035, 7500)
    for _ in range(10):
        s.step_batch()
    d = s.state_dict()
    s2 = make_eden2(0.035, 7500)
    s2.load_state_dict(d)
    assert s2.get_lr() == s.get_lr()


def test_scalar_clamp():
    opt = scaled_adam(scalar_max=10.0)
    params = {"s": jnp.asarray(9.999)}
    state = opt.init(params)
    for _ in range(200):
        updates, state = opt.update(
            {"s": jnp.asarray(-5.0)}, state, params, lr=1.0
        )
        params = optax.apply_updates(params, updates)
    assert float(params["s"]) <= 10.0 + 1e-6


def test_zero_grads_no_nan():
    opt = scaled_adam(clipping_scale=2.0)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    g = {"w": jnp.zeros((4, 4))}
    for _ in range(5):
        updates, state = opt.update(g, state, params, lr=0.01)
        params = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(params["w"])).all()


def test_eve_matches_reference(reference_dir):
    import_reference()
    from flow2gan.optim import Eve as TorchEve

    rng = np.random.RandomState(0)
    p0 = {
        "w": np.asarray(rng.randn(5, 4), np.float32),
        "s": np.asarray(rng.randn(), np.float32).reshape(()),
    }
    tp = {k: torch.nn.Parameter(torch.from_numpy(np.array(v))) for k, v in p0.items()}
    topt = TorchEve(tp.values(), lr=0.01)
    grads = [
        {k: np.asarray(rng.randn(*v.shape), np.float32).reshape(v.shape)
         for k, v in p0.items()}
        for _ in range(50)
    ]
    for g in grads:
        for k, pp in tp.items():
            pp.grad = torch.from_numpy(np.array(g[k]))
        topt.step()
        topt.zero_grad()

    from flow2gan_tpu.training.optim import eve

    opt = eve(lr=0.01)
    params = {k: jnp.asarray(v) for k, v in p0.items()}
    st = opt.init(params)
    for g in grads:
        upd, st = opt.update({k: jnp.asarray(v) for k, v in g.items()}, st, params)
        params = optax.apply_updates(params, upd)
    for k in params:
        err = np.abs(np.asarray(params[k]) - tp[k].detach().numpy()).max()
        assert err < 1e-5, (k, err)


def test_make_lr_scale_tree():
    from flow2gan_tpu.training.optim import make_lr_scale_tree

    params = {"enc": {"a": jnp.ones(2), "sub": {"b": jnp.ones(2)}}, "dec": {"c": jnp.ones(2)}}
    tree = make_lr_scale_tree(params, {"enc": 0.5, "enc/sub": 0.2, "dec/c": 0.0})
    assert tree["enc"]["a"] == 0.5
    assert tree["enc"]["sub"]["b"] == 0.5 * 0.2
    assert tree["dec"]["c"] == 0.0


def test_scaled_adam_respects_lr_scale():
    from flow2gan_tpu.training.optim import make_lr_scale_tree

    opt = scaled_adam()
    params = {"a": jnp.ones((3, 3)), "b": jnp.ones((3, 3))}
    state = opt.init(params)
    g = {"a": jnp.ones((3, 3)), "b": jnp.ones((3, 3))}
    ls = make_lr_scale_tree(params, {"b": 0.0})
    upd, state = opt.update(g, state, params, lr=0.01, lr_scale=ls)
    assert np.abs(np.asarray(upd["a"])).max() > 0
    np.testing.assert_array_equal(np.asarray(upd["b"]), 0.0)


def test_poisoned_batch_does_not_corrupt_params():
    """Regression: NaN grads with a collapsed clip (ans==0) must leave params
    untouched — g * 0 keeps NaN, so the zeroing must be a where()."""
    opt = scaled_adam(clipping_scale=2.0)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    # calibrate the clipping threshold with clean steps
    for i in range(12):
        upd, state = opt.update({"w": jnp.ones((4, 4))}, state, params, lr=0.01)
        params = optax.apply_updates(params, upd)
    good = jax.tree.map(np.asarray, params)
    # poisoned batch
    upd, state = opt.update({"w": jnp.full((4, 4), jnp.nan)}, state, params, lr=0.01)
    params = optax.apply_updates(params, upd)
    assert float(state.clip_scale) == 0.0
    assert np.isfinite(np.asarray(params["w"])).all()
    # optimizer state must also stay finite (momentum/eas fed zeroed grads)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(state.exp_avg_sq)
    )
    # a following clean step still works
    upd, state = opt.update({"w": jnp.ones((4, 4))}, state, params, lr=0.01)
    params = optax.apply_updates(params, upd)
    assert np.isfinite(np.asarray(params["w"])).all()


def test_poisoned_batch_before_calibration():
    """Regression: non-finite grads at steps < 10 (no threshold yet) must
    still zero the update — previously clip was forced to 1.0 there."""
    opt = scaled_adam(clipping_scale=2.0)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    for _ in range(2):
        upd, state = opt.update({"w": jnp.ones((4, 4))}, state, params, lr=0.01)
        params = optax.apply_updates(params, upd)
    upd, state = opt.update({"w": jnp.full((4, 4), jnp.nan)}, state, params, lr=0.01)
    params = optax.apply_updates(params, upd)
    assert float(state.clip_scale) == 0.0
    assert np.isfinite(np.asarray(params["w"])).all()


def test_nonfinite_loss_guard():
    from flow2gan_tpu.training.hooks import NonfiniteLossGuard

    g = NonfiniteLossGuard(max_streak=3)
    dumps = []
    g.check(1.0, 1.0, 1, dumps.append)  # finite: no-op
    g.check(float("nan"), 0.0, 2, dumps.append)  # protected: continue
    assert dumps == ["-first-nonfinite"]
    with pytest.raises(RuntimeError):  # unprotected: abort immediately
        g.check(float("nan"), 1.0, 3, dumps.append)
    g2 = NonfiniteLossGuard(max_streak=2)
    g2.check(float("nan"), 0.0, 1, lambda s: None)
    with pytest.raises(RuntimeError):  # streak limit even when protected
        g2.check(float("nan"), 0.0, 2, lambda s: None)


def test_parse_lr_scale_rules():
    from flow2gan_tpu.training.optim import parse_lr_scale_rules

    assert parse_lr_scale_rules(None, None) is None
    assert parse_lr_scale_rules("", "") is None
    rules = parse_lr_scale_rules("enc=0.5, dec/c=2.0", "cond_encoder, estimators_0")
    assert rules == {"enc": 0.5, "dec/c": 2.0, "cond_encoder": 0.0, "estimators_0": 0.0}
    with pytest.raises(ValueError):
        parse_lr_scale_rules("enc0.5", None)


def test_frozen_subtree_does_not_move_in_train_step():
    """--freeze-modules end-to-end: a full FM train step with a frozen
    cond_encoder must leave every cond_encoder leaf bit-identical while the
    rest of the model trains (reference freeze_modules surface,
    ref utils.py:100-116 wired at bin/pretrain.py:795)."""
    from flow2gan_tpu.models import build_generator, get_generator_config
    from flow2gan_tpu.ops.mel import LogMelSpectrogram
    from flow2gan_tpu.training.optim import make_lr_scale_tree, parse_lr_scale_rules
    from flow2gan_tpu.training.train_step import init_train_state, make_fm_train_step

    cfg = get_generator_config("mel_24k_tiny")
    model = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate,
        n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length,
        n_mels=cfg.n_mels,
    )
    key = jax.random.PRNGKey(0)
    B, L = 2, 2048
    audio = 0.3 * jax.random.normal(key, (B, L), jnp.float32)
    batch = {"audio": audio, "audio_lens": jnp.full((B,), L, jnp.int32)}
    params = model.init(
        {"params": key, "noise": key, "gate": key, "dropout": key},
        mel_fn(audio), audio, batch["audio_lens"], train=True,
    )["params"]

    rules = parse_lr_scale_rules(None, "cond_encoder")
    lr_scale = make_lr_scale_tree(params, rules)
    opt = scaled_adam(clipping_scale=2.0)
    step = make_fm_train_step(
        model, opt, lr_fn=lambda b: eden2_lr(0.035, b, 7500.0), mel_fn=mel_fn,
        lr_scale=lr_scale, donate=False,
    )
    state = init_train_state(params, opt)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    frozen_before = jax.tree.leaves(params["cond_encoder"])
    frozen_after = jax.tree.leaves(new_state.params["cond_encoder"])
    for a, b in zip(frozen_before, frozen_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    moved = [
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(params["estimators_0"]),
            jax.tree.leaves(new_state.params["estimators_0"]),
        )
    ]
    assert any(moved), "unfrozen branch params should have been updated"


def test_trainer_parsers_expose_freeze_flags():
    from flow2gan_tpu.bin.pretrain import get_parser as fm_parser
    from flow2gan_tpu.bin.finetune import get_parser as gan_parser

    a = fm_parser().parse_args(["--freeze-modules", "cond_encoder",
                                "--lr-scale-rules", "estimators_0=0.5"])
    assert a.freeze_modules == "cond_encoder"
    assert a.lr_scale_rules == "estimators_0=0.5"
    b = gan_parser().parse_args(["--freeze-modules", "cond_encoder"])
    assert b.freeze_modules == "cond_encoder"
