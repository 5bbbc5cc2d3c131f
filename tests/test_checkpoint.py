"""Checkpoint save/load/averaging tests, incl. golden comparison of the
windowed running-average differencing against the reference implementation."""

import numpy as np
import pytest
import torch

from flow2gan_tpu.training.checkpoint import (
    average_checkpoints,
    average_checkpoints_with_averaged_model,
    find_checkpoints,
    load_checkpoint,
    remove_checkpoints,
    save_checkpoint,
    save_checkpoint_with_global_batch_idx,
    update_averaged_model,
    update_ema_model,
)

from .reference_stubs import import_reference


def _params(seed, scale=1.0):
    rng = np.random.RandomState(seed)
    return {
        "layer": {"kernel": np.asarray(rng.randn(4, 3) * scale, np.float32)},
        "scalar": np.asarray(rng.randn() * scale, np.float32).reshape(()),
    }


def test_save_load_roundtrip(tmp_path):
    p = _params(0)
    avg = {k: np.asarray(v, np.float64) if not isinstance(v, dict) else
           {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
           for k, v in p.items()}
    save_checkpoint(
        tmp_path / "epoch-1.ckpt",
        params=p,
        model_avg=avg,
        scheduler_state={"batch": 10, "epoch": 1},
        train_params={"batch_idx_train": 1234, "base_lr": 0.035},
    )
    ckpt = load_checkpoint(tmp_path / "epoch-1.ckpt")
    np.testing.assert_array_equal(ckpt["model"]["layer"]["kernel"], p["layer"]["kernel"])
    assert ckpt["model_avg"]["layer"]["kernel"].dtype == np.float64
    assert ckpt["batch_idx_train"] == 1234
    assert ckpt["scheduler"]["batch"] == 10


def test_update_averaged_model_polyak():
    avg = {"w": np.full((2,), 1.0, np.float64)}
    cur = {"w": np.full((2,), 3.0, np.float32)}
    # avg = cur * (200/1000) + avg * 0.8 = 3*0.2 + 1*0.8 = 1.4
    out = update_averaged_model(avg, cur, average_period=200, batch_idx_train=1000)
    np.testing.assert_allclose(out["w"], 1.4)


def test_update_ema():
    ema = {"w": np.full((2,), 1.0, np.float64)}
    cur = {"w": np.full((2,), 2.0, np.float32)}
    out = update_ema_model(ema, cur, ema_decay=0.9)
    np.testing.assert_allclose(out["w"], 1.1)


def test_average_checkpoints_plain(tmp_path):
    for i, seed in enumerate([1, 2, 3]):
        save_checkpoint(tmp_path / f"epoch-{i}.ckpt", params=_params(seed))
    avg = average_checkpoints([tmp_path / f"epoch-{i}.ckpt" for i in range(3)])
    expect = np.mean(
        [_params(s)["layer"]["kernel"] for s in [1, 2, 3]], axis=0
    )
    np.testing.assert_allclose(avg["layer"]["kernel"], expect, rtol=1e-6)


def test_windowed_average_matches_reference(tmp_path, reference_dir):
    """Golden: our running-average differencing == reference
    average_checkpoints_with_averaged_model on identical synthetic data."""
    import_reference()
    from flow2gan.checkpoint import (
        average_checkpoints_with_averaged_model as ref_avg,
    )

    avg_start = _params(10, scale=5.0)
    avg_end = _params(11, scale=5.0)
    b_start, b_end = 40_000, 100_000

    # ours
    save_checkpoint(
        tmp_path / "epoch-10.ckpt",
        params=_params(0),
        model_avg=avg_start,
        train_params={"batch_idx_train": b_start},
    )
    save_checkpoint(
        tmp_path / "epoch-25.ckpt",
        params=_params(1),
        model_avg=avg_end,
        train_params={"batch_idx_train": b_end},
    )
    ours = average_checkpoints_with_averaged_model(
        tmp_path / "epoch-10.ckpt", tmp_path / "epoch-25.ckpt"
    )

    # reference (torch files with the same contents)
    def to_torch(d):
        return {
            "layer.kernel": torch.from_numpy(np.asarray(d["layer"]["kernel"], np.float64)),
            "scalar": torch.from_numpy(np.asarray(d["scalar"], np.float64).reshape(())),
        }

    torch.save(
        {"model_avg": to_torch(avg_start), "batch_idx_train": b_start},
        tmp_path / "ref-start.pt",
    )
    torch.save(
        {"model_avg": to_torch(avg_end), "batch_idx_train": b_end},
        tmp_path / "ref-end.pt",
    )
    theirs = ref_avg(str(tmp_path / "ref-start.pt"), str(tmp_path / "ref-end.pt"))

    np.testing.assert_allclose(
        ours["layer"]["kernel"],
        theirs["layer.kernel"].numpy().astype(np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours["scalar"]),
        theirs["scalar"].numpy().astype(np.float32),
        rtol=1e-6,
    )


def test_topk_retention(tmp_path):
    for i in [100, 200, 300, 400]:
        save_checkpoint_with_global_batch_idx(
            tmp_path, i, params=_params(i)
        )
    found = find_checkpoints(tmp_path)
    assert len(found) == 4 and "400" in found[0]
    remove_checkpoints(tmp_path, topk=2)
    found = find_checkpoints(tmp_path)
    assert len(found) == 2
    assert "400" in found[0] and "300" in found[1]


def test_optimizer_state_roundtrip(tmp_path):
    """Regression: NamedTuple optimizer states must survive msgpack
    (save_checkpoint runs to_state_dict first)."""
    import jax.numpy as jnp
    import optax

    from flow2gan_tpu.training.optim import scaled_adam

    opt = scaled_adam(clipping_scale=2.0)
    params = {"w": jnp.ones((3, 2)), "s": jnp.asarray(0.5)}
    state = opt.init(params)
    for i in range(3):
        upd, state = opt.update(
            {"w": jnp.full((3, 2), 0.1), "s": jnp.asarray(0.1)},
            state,
            params,
            lr=0.01,
        )
        params = optax.apply_updates(params, upd)

    save_checkpoint(
        tmp_path / "c.ckpt",
        params=params,
        optimizer_state=state,
        train_params={"batch_idx_train": 3},
    )
    loaded = load_checkpoint(tmp_path / "c.ckpt")
    from flow2gan_tpu.training.checkpoint import restore_params

    state2 = restore_params(state, loaded["optimizer"])
    # restore gives numpy leaves; the jitted train step converts implicitly,
    # here we do it explicitly to call update() outside jit
    import jax

    state2 = jax.tree.map(jnp.asarray, state2)
    assert type(state2).__name__ == "ScaledAdamState"
    assert int(state2.step) == 3
    np.testing.assert_allclose(
        np.asarray(state2.delta["w"]), np.asarray(state.delta["w"])
    )
    # resumed optimizer continues identically
    upd_a, _ = scaled_adam(clipping_scale=2.0).update(
        {"w": jnp.full((3, 2), 0.1), "s": jnp.asarray(0.1)}, state, params, lr=0.01
    )
    upd_b, _ = scaled_adam(clipping_scale=2.0).update(
        {"w": jnp.full((3, 2), 0.1), "s": jnp.asarray(0.1)}, state2, params, lr=0.01
    )
    np.testing.assert_allclose(np.asarray(upd_a["w"]), np.asarray(upd_b["w"]))


def test_save_averaged_model_avg_equals_epochs_fallback(tmp_path, monkeypatch):
    """--avg == --epochs with no epoch-0.ckpt (exp dirs from trainers that
    predate the epoch-0 snapshot) must fall back to a plain average instead
    of exiting: round 4's held-out drive lost three trained GAN models to
    the hard exit (run_libritts.sh stage 4b passes --gan-avg == --gan-epochs).
    """
    from flow2gan_tpu.bin.save_averaged_model import main

    save_checkpoint(
        tmp_path / "epoch-1.ckpt",
        params=_params(7),
        model_avg=_params(8),
        train_params={"batch_idx_train": 100},
    )
    monkeypatch.setattr(
        "sys.argv",
        ["save_averaged_model", "--exp-dir", str(tmp_path),
         "--epoch", "1", "--avg", "1"],
    )
    main()
    out = load_checkpoint(tmp_path / "averaged.ckpt")["model"]
    np.testing.assert_allclose(
        out["layer"]["kernel"], _params(7)["layer"]["kernel"], rtol=1e-6
    )


def test_save_averaged_model_uses_epoch0_window(tmp_path, monkeypatch):
    """With the trainer's epoch-0 snapshot present, --avg == --epochs keeps
    the windowed running-average semantics (window = the whole run)."""
    from flow2gan_tpu.bin.save_averaged_model import main

    save_checkpoint(
        tmp_path / "epoch-0.ckpt",
        params=_params(1),
        model_avg=_params(1),
        train_params={"batch_idx_train": 0},
    )
    save_checkpoint(
        tmp_path / "epoch-1.ckpt",
        params=_params(7),
        model_avg=_params(8),
        train_params={"batch_idx_train": 100},
    )
    monkeypatch.setattr(
        "sys.argv",
        ["save_averaged_model", "--exp-dir", str(tmp_path),
         "--epoch", "1", "--avg", "1"],
    )
    main()
    out = load_checkpoint(tmp_path / "averaged.ckpt")["model"]
    # weight_end = 100/(100-0) = 1, weight_start = 0 -> the end running avg
    np.testing.assert_allclose(
        out["layer"]["kernel"], _params(8)["layer"]["kernel"], rtol=1e-6
    )
