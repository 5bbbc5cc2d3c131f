"""Unit tests for bin/infer.py checkpoint resolution (epoch / plain avg /
windowed avg / GAN unwrap) using tiny-model checkpoints on disk."""

import argparse
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flow2gan_tpu.bin.infer import resolve_params
from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.training.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def tiny_ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("exp")
    cfg = get_generator_config("mel_24k_tiny")
    model = build_generator(cfg)
    rng = jax.random.PRNGKey(0)
    init = model.init(
        {"params": rng, "noise": rng}, jnp.zeros((1, cfg.n_mels, 8)),
        n_timesteps=1, method="infer",
    )["params"]

    def scaled(s):
        return jax.tree.map(lambda x: np.asarray(x) * s, init)

    for epoch, scale, bidx in [(1, 1.0, 100), (2, 2.0, 200), (3, 3.0, 300)]:
        save_checkpoint(
            d / f"epoch-{epoch}.ckpt",
            params=scaled(scale),
            model_avg=jax.tree.map(lambda x: np.asarray(x, np.float64), scaled(scale)),
            train_params={"batch_idx_train": bidx},
        )
    return d, model, init


def _args(exp_dir, **kw):
    base = dict(
        checkpoint=None, hf_model_name=None, epoch=None, avg=None,
        use_averaged_model=True, load_gan=False, exp_dir=exp_dir,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def test_resolve_epoch(tiny_ckpts):
    d, model, init = tiny_ckpts
    params = resolve_params(_args(d, epoch=2), model, init)
    a = jax.tree.leaves(init)[0]
    b = jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(b), 2.0 * np.asarray(a), rtol=1e-6)


def test_resolve_plain_average(tiny_ckpts):
    d, model, init = tiny_ckpts
    params = resolve_params(
        _args(d, epoch=3, avg=2, use_averaged_model=False), model, init
    )
    a = jax.tree.leaves(init)[0]
    b = jax.tree.leaves(params)[0]
    # mean of epochs 2 and 3 -> 2.5x
    np.testing.assert_allclose(np.asarray(b), 2.5 * np.asarray(a), rtol=1e-6)


def test_resolve_windowed_average(tiny_ckpts):
    d, model, init = tiny_ckpts
    params = resolve_params(_args(d, epoch=3, avg=2), model, init)
    a = np.asarray(jax.tree.leaves(init)[0], np.float64)
    # windowed: (avg3 * 300 - avg1 * 100) / 200 = (3*300 - 1*100)/200 = 4x
    b = jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(b), 4.0 * a, rtol=1e-5)


def test_resolve_requires_source(tiny_ckpts):
    d, model, init = tiny_ckpts
    with pytest.raises(ValueError):
        resolve_params(_args(d), model, init)


def test_save_averaged_model_window_guard(tiny_ckpts, monkeypatch, capsys):
    """A window whose start checkpoint is genuinely missing mid-range exits
    with guidance instead of a raw FileNotFoundError; the epoch-0 edge
    (avg == epochs on exp dirs predating the epoch-0 snapshot) instead
    falls back to a plain average (round 5 — the hard exit burned three
    trained GAN models in round 4's drive)."""
    import sys

    from flow2gan_tpu.bin import save_averaged_model

    import shutil

    src, _, _ = tiny_ckpts
    # copy: this test deletes a checkpoint, the fixture is module-shared
    d = src.parent / "window_guard_exp"
    if d.exists():
        shutil.rmtree(d)
    shutil.copytree(src, d)
    # avg == epochs with no epoch-0 -> loud plain-average fallback, not exit
    monkeypatch.setattr(
        sys, "argv",
        ["save_averaged_model", "--exp-dir", str(d), "--epoch", "3",
         "--avg", "3", "--output", str(d / "fallback.ckpt")],
    )
    save_averaged_model.main()
    assert (d / "fallback.ckpt").exists()

    # mid-range missing start (epoch-1 deleted, window (1, 3]) -> hard exit
    (d / "epoch-1.ckpt").unlink()
    monkeypatch.setattr(
        sys, "argv",
        ["save_averaged_model", "--exp-dir", str(d), "--epoch", "3",
         "--avg", "2", "--output", str(d / "never.ckpt")],
    )
    with pytest.raises(SystemExit) as e:
        save_averaged_model.main()
    assert "--use-averaged-model false" in str(e.value)
    assert not (d / "never.ckpt").exists()


def test_save_averaged_model_plain_fallback(tiny_ckpts, monkeypatch):
    """The suggested plain-average fallback works for the same window."""
    import sys

    from flow2gan_tpu.bin import save_averaged_model
    from flow2gan_tpu.training.checkpoint import load_checkpoint

    d, _, init = tiny_ckpts
    out = d / "plain3.ckpt"
    monkeypatch.setattr(
        sys, "argv",
        ["save_averaged_model", "--exp-dir", str(d), "--epoch", "3",
         "--avg", "3", "--use-averaged-model", "false",
         "--output", str(out)],
    )
    save_averaged_model.main()
    tree = load_checkpoint(out)["model"]
    # epochs hold params scaled 1x/2x/3x -> plain average is 2x the init
    got = jax.tree.leaves(tree)[0]
    want = 2.0 * np.asarray(jax.tree.leaves(init)[0])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_infer_absolute_manifest_stays_in_output_dir(tiny_ckpts, tmp_path, monkeypatch):
    """A manifest with ABSOLUTE sources and no --root-path must write inside
    --output-dir; `output_dir / "/abs/path"` discards the left side, which
    once overwrote the source corpus with generated audio (round-4 bug)."""
    import gzip
    import json
    import sys

    from flow2gan_tpu.bin.infer import main as infer_main
    from flow2gan_tpu.data.audio_io import write_wav

    d, model, init = tiny_ckpts
    src_dir = tmp_path / "corpus" / "spk"
    src_dir.mkdir(parents=True)
    wav = (np.random.RandomState(0).randn(12000) * 0.1).astype(np.float32)
    write_wav(src_dir / "u0.wav", wav, 24000)
    before = (src_dir / "u0.wav").read_bytes()

    man = tmp_path / "recs.jsonl.gz"
    with gzip.open(man, "wt") as f:
        f.write(json.dumps({
            "id": "u0",
            "sources": [{"type": "file", "channels": [0],
                         "source": str(src_dir / "u0.wav")}],
            "sampling_rate": 24000, "num_samples": 12000, "duration": 0.5,
        }) + "\n")

    out_dir = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "infer", "--model-name", "mel_24k_tiny",
        "--checkpoint", str(d / "epoch-1.ckpt"),
        "--recordings", str(man), "--output-dir", str(out_dir),
        "--n-timesteps", "1",
    ])
    infer_main()

    written = list(out_dir.rglob("*.wav"))
    assert written, "no output wavs written"
    for w in written:
        assert str(w).startswith(str(out_dir))
    assert (src_dir / "u0.wav").read_bytes() == before, "source corpus modified"
