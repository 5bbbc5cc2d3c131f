"""Finetune observability parity (reference bin/finetune.py:171,633-656):
the --inf-check surface — jitted debug grad fns for BOTH optimizers feeding
dominant-parameter ranking, and module-level localization of an injected
non-finite value through the generator rollout capture."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.models.discriminators import Discriminators
from flow2gan_tpu.models.gan import make_mel_recon_fns
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.training.gan_step import make_gan_grad_fns
from flow2gan_tpu.training.hooks import find_nonfinite_module_outputs
from flow2gan_tpu.training.optim import dominant_parameters


@pytest.fixture(scope="module")
def tiny_gan():
    cfg = dict(get_generator_config("mel_24k_tiny"))
    cfg["branch_dropout"] = 0.0
    generator = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg["sampling_rate"],
        n_fft=cfg["mel_n_fft"],
        hop_length=cfg["mel_hop_length"],
        n_mels=cfg["n_mels"],
    )
    discriminators = Discriminators(periods=(2, 3), fft_sizes=(256, 128))
    mel_recon_fns = make_mel_recon_fns(
        cfg["sampling_rate"], mel_recon_n_ffts=(64, 128), mel_recon_n_mels=(10, 20)
    )
    L = 4800
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(2, L) * 0.1, jnp.float32),
        "audio_lens": jnp.full((2,), L, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    params_g = generator.init(
        {"params": key, "noise": key, "gate": key, "dropout": key},
        mel_fn(batch["audio"]),
        audio_lens=batch["audio_lens"],
        n_timesteps=2,
        train=True,
        method="infer",
    )["params"]
    params_d = discriminators.init(key, batch["audio"], batch["audio"])["params"]
    return generator, discriminators, mel_fn, mel_recon_fns, params_g, params_d, batch


def test_gan_grad_fns_match_structure_and_are_finite(tiny_gan):
    """make_gan_grad_fns returns per-optimizer grads shaped like the params
    (the finetune --inf-check surface for BOTH optimizers)."""
    generator, discs, mel_fn, mrf, params_g, params_d, batch = tiny_gan
    grad_d, grad_g = make_gan_grad_fns(
        generator, discs, mel_fn, mrf, n_timesteps=2
    )
    rng = jax.random.PRNGKey(3)
    gd = grad_d(params_d, params_g, batch, rng)
    gg = grad_g(params_g, params_d, batch, rng)
    assert jax.tree_util.tree_structure(gd) == jax.tree_util.tree_structure(params_d)
    assert jax.tree_util.tree_structure(gg) == jax.tree_util.tree_structure(params_g)
    for g in jax.tree.leaves(gd):
        assert np.isfinite(np.asarray(g)).all()
    # G grads flow through the whole rollout: some must be nonzero
    assert any(float(jnp.abs(g).max()) > 0 for g in jax.tree.leaves(gg))


def test_dominant_parameter_named_on_poisoned_grads(tiny_gan):
    """A hard-clip replay with one exploded parameter gradient names that
    parameter first (reference show_dominant_parameters, optim.py:670-734,
    which finetune attaches to both optimizers)."""
    generator, discs, mel_fn, mrf, params_g, params_d, batch = tiny_gan
    grad_d, _ = make_gan_grad_fns(generator, discs, mel_fn, mrf, n_timesteps=2)
    gd = grad_d(params_d, params_g, batch, jax.random.PRNGKey(3))
    # simulate one exploding gradient, as a clipped-to-zero step would see:
    # overwrite one leaf with a value dwarfing the whole tree's norm
    flat = jax.tree_util.tree_flatten_with_path(gd)
    (path0, leaf0) = flat[0][0]
    big = 1e3 * max(float(jnp.abs(l).max()) for _, l in flat[0])
    poisoned = jax.tree_util.tree_unflatten(
        flat[1],
        [jnp.full_like(l, big) if i == 0 else l
         for i, (p, l) in enumerate(flat[0])],
    )
    top = dominant_parameters(poisoned)
    name0 = "/".join(str(getattr(k, "key", "?")) for k in path0)
    assert top[0][0] == name0
    assert top[0][1] > 0.99  # >99% of the squared norm


def test_injected_inf_localized_to_module(tiny_gan):
    """An inf injected into a mid-network generator parameter is localized to
    the module that produced the first non-finite output by the finetune
    _capture_intermediates replay (reference inf-check fwd hooks,
    hooks.py:27-96)."""
    generator, discs, mel_fn, mrf, params_g, params_d, batch = tiny_gan
    # poison one conv kernel deep in the first estimator branch
    flat = jax.tree_util.tree_flatten_with_path(params_g)
    names = [
        "/".join(str(getattr(k, "key", "?")) for k in p) for p, _ in flat[0]
    ]
    target = next(
        i for i, n in enumerate(names) if "kernel" in n and "estimator" in n.lower()
    )
    leaves = [l for _, l in flat[0]]
    leaves[target] = jnp.full_like(leaves[target], jnp.inf)
    poisoned = jax.tree_util.tree_unflatten(flat[1], leaves)

    _, inter = generator.apply(
        {"params": poisoned},
        mel_fn(batch["audio"]),
        n_timesteps=2,
        method="infer",
        rngs={"noise": jax.random.PRNGKey(0)},
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    bad = find_nonfinite_module_outputs(inter["intermediates"])
    assert bad, "no non-finite module outputs found"
    # the poisoned module's scope appears among the birth-site candidates;
    # deepest (no-bad-descendant) entries are listed first
    poisoned_scope = names[target].rsplit("/", 1)[0]
    owner = poisoned_scope.rsplit("/", 1)[-1]
    assert any(owner in b for b in bad), (owner, bad)


def test_g_loss_auto_scans_rollout_at_multistep(tiny_gan):
    """make_gan_loss_fns defaults to the scanned Euler rollout when
    n_timesteps > 1 (one generator body in the differentiated program —
    the compile-size fix for the stage-4 G-step) and to the unrolled
    form at n_timesteps == 1."""
    generator, discs, mel_fn, mrf, params_g, params_d, batch = tiny_gan
    from flow2gan_tpu.training.gan_step import make_gan_loss_fns

    rng = jax.random.PRNGKey(3)

    def has_scan(n, **kw):
        _, g_loss_fn = make_gan_loss_fns(
            generator, discs, mel_fn, mrf, n_timesteps=n, **kw
        )
        jaxpr = jax.make_jaxpr(
            lambda pg: g_loss_fn(pg, params_d, batch, rng)[0]
        )(params_g)
        return "scan" in str(jaxpr.jaxpr)

    assert has_scan(2)
    assert not has_scan(1)
    assert not has_scan(2, scan_rollout=False)


def test_gan_grad_fns_thread_remat_rollout(tiny_gan):
    """The debug grad replay must honor --remat-rollout (it differentiates
    the same multi-step rollout as the trained G step; un-remattered it OOMs
    HBM on exactly the 44.1 kHz 4-step config the flag exists for) and the
    remattered grads must match the plain ones."""
    generator, discs, mel_fn, mrf, params_g, params_d, batch = tiny_gan
    rng = jax.random.PRNGKey(3)
    _, gg_plain_fn = make_gan_grad_fns(
        generator, discs, mel_fn, mrf, n_timesteps=2, remat_rollout=False
    )
    _, gg_remat_fn = make_gan_grad_fns(
        generator, discs, mel_fn, mrf, n_timesteps=2, remat_rollout=True
    )
    gg_plain = gg_plain_fn(params_g, params_d, batch, rng)
    gg_remat = gg_remat_fn(params_g, params_d, batch, rng)
    for a, b in zip(jax.tree.leaves(gg_plain), jax.tree.leaves(gg_remat)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_diag_objective_threads_remat_rollout(tiny_gan):
    """_make_diag_objective passes remat_rollout through to the G objective
    (same loss value either way at n_timesteps=2)."""
    from flow2gan_tpu.bin.finetune import _make_diag_objective
    from flow2gan_tpu.training.gan_step import GANLossScales

    generator, discs, mel_fn, mrf, params_g, params_d, batch = tiny_gan
    rng = jax.random.PRNGKey(5)
    vals = []
    for remat in (False, True):
        g_loss_fn, _ = _make_diag_objective(
            generator, discs, mel_fn, mrf, GANLossScales(),
            n_timesteps=2, remat_rollout=remat,
        )
        vals.append(float(g_loss_fn(params_g, params_d, batch, rng)[0]))
    assert abs(vals[0] - vals[1]) < 1e-4 * max(1.0, abs(vals[0]))
