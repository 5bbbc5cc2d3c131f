"""Public API tests: get_model config/checkpoint resolution paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import flow2gan_tpu
from flow2gan_tpu.training.checkpoint import save_checkpoint


def test_get_model_random_init_and_infer():
    m = flow2gan_tpu.get_model("mel_24k_tiny")
    mel = jnp.zeros((1, m.config.n_mels, 8))
    wav = m.infer(mel, n_timesteps=1)
    assert wav.shape == (1, 8 * m.config.mel_hop_length)


def test_get_model_native_checkpoint(tmp_path):
    m = flow2gan_tpu.get_model("mel_24k_tiny")
    # export params scaled by 0.5, reload via get_model, verify they're used
    params = jax.tree.map(lambda x: np.asarray(x) * 0.5, m.variables["params"])
    save_checkpoint(tmp_path / "model.ckpt", params=params)
    m2 = flow2gan_tpu.get_model("mel_24k_tiny", checkpoint=str(tmp_path / "model.ckpt"))
    for a, b in zip(
        jax.tree.leaves(m.variables["params"]), jax.tree.leaves(m2.variables["params"])
    ):
        np.testing.assert_allclose(np.asarray(b), 0.5 * np.asarray(a), rtol=1e-6)
    mel = jnp.ones((1, m2.config.n_mels, 8))
    wav = m2.infer(mel, n_timesteps=1)
    assert np.isfinite(np.asarray(wav)).all()


def test_get_model_unknown_names():
    with pytest.raises(ValueError):
        flow2gan_tpu.get_model("nope")
    with pytest.raises(ValueError):
        flow2gan_tpu.get_model(hf_model_name="nope")
    with pytest.raises(FileNotFoundError):
        flow2gan_tpu.get_model("mel_24k_tiny", checkpoint="/does/not/exist.pt")
