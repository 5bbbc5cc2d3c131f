"""Token-conditioned generation: k-means pseudo-codec + TokenAudioGenerator
end-to-end (BASELINE.json configs[3]; reference CondEncoder "codec
embeddings" conditioning, modules.py:499)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.models.generator import TokenAudioGenerator
from flow2gan_tpu.ops.tokenizer import MelKMeansTokenizer, kmeans_fit


def _fit_tiny_tokenizer(cfg, n=400, seed=0):
    X = np.random.RandomState(seed).randn(n, cfg.n_mels).astype(np.float32)
    C = kmeans_fit(X, cfg.vocab_size, iters=8, seed=seed)
    return MelKMeansTokenizer(
        C, cfg.sampling_rate, cfg.mel_n_fft, cfg.mel_hop_length, cfg.n_mels
    )


def test_kmeans_fit_deterministic_and_separating():
    rs = np.random.RandomState(0)
    # 4 well-separated gaussian blobs -> k=4 recovers the means
    means = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    X = np.concatenate(
        [m + 0.1 * rs.randn(200, 2).astype(np.float32) for m in means]
    )
    C1 = kmeans_fit(X, 4, iters=20, seed=1)
    C2 = kmeans_fit(X, 4, iters=20, seed=1)
    np.testing.assert_array_equal(C1, C2)
    # every true mean has a centroid within 0.1
    d = np.linalg.norm(C1[None] - means[:, None], axis=-1).min(axis=1)
    assert d.max() < 0.1, d


def test_quantize_is_nearest_centroid():
    cfg = get_generator_config("token_24k_tiny")
    tok = _fit_tiny_tokenizer(cfg)
    mel = jnp.asarray(
        np.random.RandomState(3).randn(2, cfg.n_mels, 9).astype(np.float32)
    )
    got = np.asarray(tok.quantize(mel))
    C = np.asarray(tok.centroids)
    frames = np.asarray(mel).transpose(0, 2, 1)
    want = np.linalg.norm(frames[:, :, None] - C[None, None], axis=-1).argmin(-1)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.int32 and got.shape == (2, 9)


def test_tokenizer_save_load_and_config_check(tmp_path):
    cfg = get_generator_config("token_24k_tiny")
    tok = _fit_tiny_tokenizer(cfg)
    p = tmp_path / "tok.npz"
    tok.save(p)
    tok2 = MelKMeansTokenizer.from_file(p, expect_config=cfg)
    np.testing.assert_array_equal(np.asarray(tok.centroids), np.asarray(tok2.centroids))
    bad = dict(cfg)
    bad["vocab_size"] = cfg.vocab_size + 1
    with pytest.raises(ValueError, match="vocab_size"):
        MelKMeansTokenizer.from_file(p, expect_config=bad)


def test_token_config_builds_token_generator_and_trains():
    """token_24k_tiny drives the full FM train step: tokens from the frozen
    codebook condition the generator, grads flow, loss is finite."""
    from flow2gan_tpu.training.optim import eden2_lr, scaled_adam
    from flow2gan_tpu.training.train_step import (
        init_train_state,
        make_fm_train_step,
    )

    cfg = get_generator_config("token_24k_tiny")
    gen = build_generator(cfg)
    assert isinstance(gen, TokenAudioGenerator)
    assert gen.vocab_size == cfg.vocab_size
    tok = _fit_tiny_tokenizer(cfg)

    B, L = 2, 4096
    key = jax.random.PRNGKey(0)
    audio = 0.2 * jax.random.normal(key, (B, L))
    batch = {"audio": audio, "audio_lens": jnp.full((B,), L, jnp.int32)}
    params = gen.init(
        {"params": key, "noise": key, "gate": key, "dropout": key},
        tok(audio), audio, batch["audio_lens"], train=True,
    )["params"]
    opt = scaled_adam(clipping_scale=2.0)
    step = make_fm_train_step(
        gen, opt, lambda b: eden2_lr(0.035, b, 7500.0), mel_fn=tok, donate=False
    )
    state = init_train_state(params, opt)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"])), metrics
    moved = [
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params))
    ]
    assert sum(moved) / len(moved) > 0.9


def test_api_get_model_token_reconstruct(tmp_path):
    import flow2gan_tpu

    cfg = get_generator_config("token_24k_tiny")
    tok = _fit_tiny_tokenizer(cfg)
    p = tmp_path / "tok.npz"
    tok.save(p)
    vm = flow2gan_tpu.get_model("token_24k_tiny", tokenizer=str(p))
    audio = jnp.zeros((1, 8 * cfg.mel_hop_length), jnp.float32)
    tokens = vm.tokens(audio)
    assert tokens.dtype == jnp.int32
    wav = vm.infer(tokens)
    assert wav.shape == (1, tokens.shape[1] * cfg.mel_hop_length)
    rec = vm.reconstruct(audio)
    assert np.isfinite(np.asarray(rec)).all()
    # without a tokenizer the token surface fails loudly
    vm2 = flow2gan_tpu.get_model("token_24k_tiny")
    with pytest.raises(ValueError, match="tokenizer"):
        vm2.tokens(audio)
