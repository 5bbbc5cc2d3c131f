"""Model-level tests on tiny configs: loss finiteness, infer shapes,
stochastic-regularizer plumbing, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.models.generator import TokenAudioGenerator
from flow2gan_tpu.models.norms import limit_param_value


@pytest.fixture(scope="module")
def tiny():
    cfg = get_generator_config("mel_24k_tiny")
    model = build_generator(cfg)
    B, L = 2, 4096
    frames = L // cfg.mel_hop_length
    rng = jax.random.PRNGKey(0)
    cond = jax.random.normal(rng, (B, cfg.n_mels, frames))
    audio = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, L))
    lens = jnp.asarray([L, L - 300])
    params = model.init(
        {"params": rng, "noise": rng, "gate": rng, "dropout": rng},
        cond,
        audio,
        lens,
        train=True,
    )
    return cfg, model, params, cond, audio, lens


def test_fm_loss_finite_and_scalar(tiny):
    cfg, model, params, cond, audio, lens = tiny
    loss = model.apply(
        params,
        cond,
        audio,
        lens,
        train=True,
        rngs={"noise": jax.random.PRNGKey(2), "gate": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)},
    )
    assert loss.shape == ()
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_fm_loss_grads_finite(tiny):
    cfg, model, params, cond, audio, lens = tiny

    def loss_fn(p):
        return model.apply(
            {"params": p["params"]},
            cond,
            audio,
            lens,
            train=True,
            rngs={"noise": jax.random.PRNGKey(2), "gate": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
        )

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # every parameter must receive gradient (model is fully used)
    norms = [float(jnp.abs(x).sum()) for x in flat]
    assert sum(1 for n in norms if n == 0.0) <= 1  # log_scale gates may zero out


@pytest.mark.parametrize("n_timesteps", [1, 2, 4])
def test_infer_shape_and_determinism(tiny, n_timesteps):
    cfg, model, params, cond, audio, lens = tiny
    out = model.apply(
        params,
        cond,
        n_timesteps=n_timesteps,
        clamp_pred=True,
        method="infer",
        rngs={"noise": jax.random.PRNGKey(7)},
    )
    assert out.shape == (cond.shape[0], cond.shape[-1] * cfg.mel_hop_length)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0
    out2 = model.apply(
        params,
        cond,
        n_timesteps=n_timesteps,
        clamp_pred=True,
        method="infer",
        rngs={"noise": jax.random.PRNGKey(7)},
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_infer_jits(tiny):
    cfg, model, params, cond, audio, lens = tiny

    @jax.jit
    def run(p, c, key):
        return model.apply(
            p, c, n_timesteps=2, method="infer", rngs={"noise": key}
        )

    out = run(params, cond, jax.random.PRNGKey(0))
    assert out.shape == (cond.shape[0], cond.shape[-1] * cfg.mel_hop_length)


def test_infer_from_noise_deterministic(tiny):
    cfg, model, params, cond, audio, lens = tiny
    L = cond.shape[-1] * cfg.mel_hop_length
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (cond.shape[0], L))
    a = model.apply(params, noise, cond, method="infer_from_noise")
    b = model.apply(params, noise, cond, method="infer_from_noise")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_limit_param_value_grad_flip():
    def f(x, gate):
        return (limit_param_value(x, 0.0, 1.0, gate) * jnp.asarray([1.0, -1.0, 1.0, -1.0])).sum()

    x = jnp.asarray([-0.5, -0.5, 1.5, 1.5])
    # raw grads: [1, -1, 1, -1]
    g_on = jax.grad(f)(x, jnp.asarray(1.0))
    # x<lo and g>0 -> flip (push up? no: reference flips so grads become
    # negative, making SGD (p -= lr*g) increase p)
    np.testing.assert_allclose(np.asarray(g_on), [-1.0, -1.0, 1.0, 1.0])
    g_off = jax.grad(f)(x, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(g_off), [1.0, -1.0, 1.0, -1.0])


def test_branch_dropout_changes_output_only_in_train(tiny):
    cfg, model, params, cond, audio, lens = tiny
    L = cond.shape[-1] * cfg.mel_hop_length
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (cond.shape[0], L))
    outs = []
    for seed in range(2):
        out = model.apply(
            params,
            noise,
            cond,
            train=True,
            method="infer_from_noise",
            rngs={
                "gate": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 10),
            },
        )
        outs.append(np.asarray(out))
    # train-mode infer is stochastic only through dropout/gates; forward values
    # are gate-independent (limit_param_value is identity in fwd), so outputs
    # may differ only via branch dropout — with p=0.05 on 2 samples they can
    # coincide; just check finiteness here.
    assert all(np.isfinite(o).all() for o in outs)


def test_token_generator():
    cfg = get_generator_config("mel_24k_tiny")
    model = TokenAudioGenerator(
        vocab_size=32,
        token_hop_length=64,
        cond_dim=20,
        cond_hop_length=64,
        n_ffts=cfg.n_ffts,
        hop_lengths=cfg.hop_lengths,
        channels=cfg.channels,
        time_embed_channels=cfg.time_embed_channels,
        conv_kernel_sizes=cfg.conv_kernel_sizes,
        num_layers=cfg.num_layers,
        cond_enc_channels=cfg.cond_enc_channels,
        cond_enc_num_layers=cfg.cond_enc_num_layers,
        loss_n_filters=cfg.loss_n_filters,
        loss_n_fft=cfg.loss_n_fft,
        loss_hop_length=cfg.loss_hop_length,
    )
    B, frames = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, frames), 0, 32)
    audio = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, frames * 64))
    lens = jnp.asarray([frames * 64] * B)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "noise": rng, "gate": rng, "dropout": rng},
        tokens,
        audio,
        lens,
        train=True,
    )
    loss = model.apply(
        variables,
        tokens,
        audio,
        lens,
        train=True,
        rngs={"noise": rng, "gate": rng, "dropout": rng},
    )
    assert np.isfinite(float(loss))
    wav = model.apply(
        variables, tokens, n_timesteps=2, method="infer", rngs={"noise": rng}
    )
    assert wav.shape == (B, frames * 64)


def test_44k_config_builds_and_infers_tiny_frames():
    """mel_44k_128band_512x_base: full-size params, minimal frames."""
    from flow2gan_tpu.models import build_generator, get_generator_config

    cfg = get_generator_config("mel_44k_128band_512x_base")
    model = build_generator(cfg)
    rng = jax.random.PRNGKey(0)
    cond = jax.random.normal(rng, (1, cfg.n_mels, 4))
    variables = model.init(
        {"params": rng, "noise": rng}, cond, n_timesteps=1, method="infer"
    )
    n_params = sum(
        int(np.prod(np.asarray(x).shape))
        for x in jax.tree_util.tree_leaves(variables)
    )
    assert 70e6 < n_params < 90e6  # same trunk as 24k model (~79M)
    wav = model.apply(
        variables, cond, n_timesteps=1, method="infer",
        rngs={"noise": rng},
    )
    assert wav.shape == (1, 4 * 512)  # 512x upsampling
    assert np.isfinite(np.asarray(wav)).all()


def test_pallas_istft_model_flag_matches_default():
    """use_pallas_istft must not change results (CPU: interpret fallback is
    skipped for unsupported hops, XLA path used — outputs identical)."""
    from flow2gan_tpu.models import build_generator, get_generator_config

    cfg = get_generator_config("mel_24k_tiny")
    m1 = build_generator(cfg)
    cfg2 = get_generator_config("mel_24k_tiny")
    cfg2["use_pallas_istft"] = True
    m2 = build_generator(cfg2)
    rng = jax.random.PRNGKey(0)
    cond = jax.random.normal(rng, (1, cfg.n_mels, 8))
    v = m1.init({"params": rng, "noise": rng}, cond, n_timesteps=1, method="infer")
    a = m1.apply(v, cond, n_timesteps=1, method="infer", rngs={"noise": rng})
    b = m2.apply(v, cond, n_timesteps=1, method="infer", rngs={"noise": rng})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compute_dtype_bf16_inside():
    """compute_dtype='bfloat16' must actually run the ConvNeXt stack in bf16
    (params stay f32, output returns f32)."""
    cfg = get_generator_config("mel_24k_tiny")
    cfg["compute_dtype"] = "bfloat16"
    model = build_generator(cfg)
    rng = jax.random.PRNGKey(0)
    cond = jax.random.normal(rng, (1, cfg.n_mels, 8))
    v = model.init({"params": rng, "noise": rng}, cond, n_timesteps=1, method="infer")
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(v["params"]))
    out, inter = model.apply(
        v, cond, n_timesteps=1, method="infer", rngs={"noise": rng},
        capture_intermediates=True, mutable=["intermediates"],
    )
    assert out.dtype == jnp.float32
    # some intermediate activations must be bf16
    leaves = jax.tree.leaves(inter["intermediates"])
    assert any(
        getattr(x, "dtype", None) == jnp.bfloat16 for x in leaves
    ), "no bf16 activations found"


def test_dwconv_stencil_matches_conv():
    """DepthwiseConv1d's fusable stencil lowering is numerically the
    convolution (same params, same math, f32 accumulation)."""
    import numpy as np

    from flow2gan_tpu.models import build_generator, get_generator_config

    cfg = dict(get_generator_config("mel_24k_tiny"))
    rng = jax.random.PRNGKey(0)
    cond = jnp.asarray(
        np.random.RandomState(0).randn(2, cfg["n_mels"], 16), jnp.float32
    )
    m_conv = build_generator({**cfg, "dwconv_impl": "conv"})
    m_sten = build_generator({**cfg, "dwconv_impl": "stencil"})
    v = m_conv.init({"params": rng, "noise": rng}, cond, n_timesteps=2, method="infer")
    a = m_conv.apply(v, cond, n_timesteps=2, method="infer", rngs={"noise": rng})
    b = m_sten.apply(v, cond, n_timesteps=2, method="infer", rngs={"noise": rng})
    assert float(jnp.abs(a - b).max()) < 1e-5


def test_dwconv_stencil_matches_conv_bf16():
    """Under compute_dtype='bfloat16' both lowerings round inputs/weights to
    bf16 and accumulate in f32, so the 'auto' switch (conv for train,
    stencil for eval) stays within bf16 rounding noise — important because
    GAN D-steps (eval-mode G rollout) and G-steps (train-mode G) would
    otherwise see systematically different generator outputs."""
    import numpy as np

    from flow2gan_tpu.models.convnext import DepthwiseConv1d

    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 32), jnp.float32)
    kw = dict(channels=32, kernel_size=7, dtype=jnp.bfloat16)
    m_conv = DepthwiseConv1d(**kw, impl="conv")
    m_sten = DepthwiseConv1d(**kw, impl="stencil")
    v = m_conv.init(jax.random.PRNGKey(0), x)
    a = np.asarray(m_conv.apply(v, x), np.float32)
    b = np.asarray(m_sten.apply(v, x), np.float32)
    scale = np.abs(a).max() + 1e-8
    # both paths see identically-rounded bf16 operands; residual difference
    # is accumulation order only — a couple of bf16 ulps relative
    assert np.abs(a - b).max() / scale < 3e-2
    assert np.median(np.abs(a - b)) / scale < 4e-3


def test_native_rate_cond_projection_commutes():
    """Decoder cond projections run at the native cond frame rate and
    nearest-repeat the result — bit-identical to projecting repeated rows
    (reference upsamples first, modules.py:668-680), minus the redundant
    FLOPs on the low-hop branches."""
    import numpy as np

    from flow2gan_tpu.models.convnext import ConvNeXtDecoder

    kw = dict(in_channels=16, out_channels=16, channels=32, cond_channels=24,
              time_embed_channels=32, num_layers=2)
    dec4 = ConvNeXtDecoder(**kw, cond_upsample_factor=4)
    dec1 = ConvNeXtDecoder(**kw, cond_upsample_factor=1)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 13, 16), jnp.float32)
    cnat = jnp.asarray(np.random.RandomState(2).randn(2, 3, 24), jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    v = dec4.init(jax.random.PRNGKey(3), x, cnat, t)
    y_native = dec4.apply(v, x, cnat, t)
    # reference-order computation: repeat to the fft rate, zero-pad, project
    cup = jnp.pad(jnp.repeat(cnat, 4, axis=1), ((0, 0), (0, 1), (0, 0)))
    y_upsampled = dec1.apply(v, x, cup, t)
    np.testing.assert_array_equal(np.asarray(y_native), np.asarray(y_upsampled))


@pytest.mark.parametrize("n_timesteps", [2, 4])
def test_scan_solve_matches_unrolled_eval(tiny, n_timesteps):
    """The nn.scan Euler rollout (used by the GAN G-step at n>1 to keep the
    differentiated program at one model copy) runs the same per-step ops as
    the unrolled loop when train=False."""
    cfg, model, params, cond, audio, lens = tiny
    L = cond.shape[-1] * cfg.mel_hop_length
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (cond.shape[0], L))
    a = model.apply(params, noise, cond, n_timesteps=n_timesteps,
                    method="infer_from_noise", scan_solve=False)
    b = model.apply(params, noise, cond, n_timesteps=n_timesteps,
                    method="infer_from_noise", scan_solve=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_scan_solve_grads_finite_and_close(tiny):
    """Differentiating through the scanned rollout gives finite grads that
    agree with the unrolled rollout's grads in eval mode (train=True draws
    per-step RNG differently between the two forms, so compare at
    train=False where both are deterministic)."""
    cfg, model, params, cond, audio, lens = tiny
    L = cond.shape[-1] * cfg.mel_hop_length
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (cond.shape[0], L))

    def loss(p, scan):
        out = model.apply({"params": p["params"]}, noise, cond, n_timesteps=2,
                          method="infer_from_noise", scan_solve=scan)
        return jnp.mean(out * out)

    g_unroll = jax.grad(lambda p: loss(p, False))(params)
    g_scan = jax.grad(lambda p: loss(p, True))(params)
    fu = jax.tree_util.tree_leaves(g_unroll)
    fs = jax.tree_util.tree_leaves(g_scan)
    assert all(np.isfinite(np.asarray(x)).all() for x in fs)
    for u, s in zip(fu, fs):
        np.testing.assert_allclose(np.asarray(u), np.asarray(s),
                                   atol=2e-5, rtol=2e-3)


@pytest.mark.parametrize("n_timesteps", [2, 4])
def test_remat_scan_matches_plain_scan(tiny, n_timesteps):
    """Scan-body rematerialization (remat_scan=True, the 44k 4-step G-step's
    HBM fix) is numerically a no-op: forward outputs are identical and grads
    through the rollout match the un-remattered scan."""
    cfg, model, params, cond, audio, lens = tiny
    L = cond.shape[-1] * cfg.mel_hop_length
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (cond.shape[0], L))

    def run(p, remat):
        return model.apply(
            {"params": p["params"]}, noise, cond, n_timesteps=n_timesteps,
            method="infer_from_noise", scan_solve=True, remat_scan=remat)

    a = run(params, False)
    b = run(params, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)

    g_plain = jax.grad(lambda p: jnp.mean(run(p, False) ** 2))(params)
    g_remat = jax.grad(lambda p: jnp.mean(run(p, True) ** 2))(params)
    for u, s in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        assert np.isfinite(np.asarray(s)).all()
        np.testing.assert_allclose(np.asarray(u), np.asarray(s),
                                   atol=2e-5, rtol=2e-3)
