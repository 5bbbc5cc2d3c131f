"""Two-process distributed integration test (VERDICT r2 #5): actually runs
the multi-host surfaces with jax.process_count() == 2 — the replacement for
the reference's torchrun + dist.py:25-69 machinery.

Spawns 2 CPU subprocesses (4 virtual devices each, localhost coordinator)
and asserts, inside the workers:
  - `init_distributed` brings up the 2-process / 8-global-device runtime;
  - `MetricsTracker.reduce` sums metrics across processes
    (replaces ref utils.py:318-326 dist.all_reduce);
  - `DataLoader` per-process shards are disjoint and complete;
  - `shard_batch`/`replicate` build global arrays from host-local data and a
    jitted global-mean computation agrees across processes;
  - only process 0 writes checkpoints (the trainers' gating convention).
The parent asserts on the workers' JSON reports.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
wav_dir = sys.argv[3]; out_dir = sys.argv[4]

# XLA_FLAGS / JAX_PLATFORMS are set by the parent in the spawn env (the
# axon sitecustomize imports jax at interpreter startup, before this body)
import jax
jax.config.update("jax_platforms", "cpu")

from flow2gan_tpu.parallel.mesh import (
    init_distributed, make_mesh, replicate, shard_batch,
)
init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4
assert len(jax.devices()) == 8

report = {"process_index": jax.process_index()}

# ---- MetricsTracker.reduce sums across processes
from flow2gan_tpu.utils import MetricsTracker
t = MetricsTracker()
t["samples"] = float(proc_id + 1)   # 1 + 2 = 3
t["loss"] = float(10 * (proc_id + 1)) # 10 + 20 = 30
t.reduce()
report["reduced"] = {"samples": t["samples"], "loss": t["loss"]}

# ---- loader shards: disjoint-and-complete across processes
from flow2gan_tpu.data.dataset import DataLoader, RecordingDataset, scan_dir_to_recordings
recs = scan_dir_to_recordings(wav_dir)
ds = RecordingDataset(recs, sampling_rate=24000, train=False, apply_effects=False)
dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
assert dl.process_index == jax.process_index()
assert dl.process_count == 2
names = []
for b in dl:
    names.extend(n for n in b["file_names"])
report["shard_names"] = sorted(names)
report["n_recordings"] = len(recs)

# ---- global mesh compute: shard_batch/replicate from host-local data
import numpy as np
import jax.numpy as jnp
mesh = make_mesh()
# each process contributes its own half of a global (8, 4) batch
local = np.full((4, 4), float(proc_id + 1), np.float32)
gbatch = shard_batch({"x": local}, mesh)
assert gbatch["x"].shape == (8, 4), gbatch["x"].shape
w = replicate({"w": np.full((4,), 2.0, np.float32)}, mesh)
out = jax.jit(lambda b, w: jnp.mean(b["x"] * w["w"]))(gbatch, w)
# mean over the global batch: (1*2 + 2*2)/2 = 3.0 on every process
report["global_mean"] = float(out)

# ---- checkpoint gating: only process 0 writes (trainers' convention)
if jax.process_index() == 0:
    from flow2gan_tpu.training.checkpoint import save_checkpoint
    save_checkpoint(
        os.path.join(out_dir, "ckpt.msgpack"),
        params={"w": np.ones(3, np.float32)},
        train_params={"batch_idx_train": 1},
    )

with open(os.path.join(out_dir, f"report_{proc_id}.json"), "w") as f:
    json.dump(report, f)
print("WORKER_OK", proc_id)
"""


def test_two_process_distributed(tmp_path):
    # tiny wav corpus for the loader-shard check
    sys.path.insert(0, str(REPO))
    from flow2gan_tpu.data.audio_io import write_wav

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        write_wav(wav_dir / f"u{i}.wav", rng.randn(2400).astype(np.float32) * 0.1,
                  24000)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    env = dict(os.environ)
    # repo path ONLY: inheriting the ambient TPU-plugin sitecustomize path
    # can block a fresh jax client forever after a previous client died
    # (see .claude/skills/verify/SKILL.md, round-3 learnings)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    # drop any inherited device-count flag (conftest sets 8 for the parent;
    # a later duplicate would win over our 4)
    inherited = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    env["XLA_FLAGS"] = " ".join(
        ["--xla_force_host_platform_device_count=4"] + inherited
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), str(port),
             str(wav_dir), str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out

    r0 = json.loads((out_dir / "report_0.json").read_text())
    r1 = json.loads((out_dir / "report_1.json").read_text())

    # metrics reduced identically on both processes
    assert r0["reduced"] == {"samples": 3.0, "loss": 30.0}
    assert r1["reduced"] == r0["reduced"]

    # loader shards: disjoint and complete
    s0, s1 = set(r0["shard_names"]), set(r1["shard_names"])
    assert s0.isdisjoint(s1), s0 & s1
    assert len(s0 | s1) == r0["n_recordings"] == 8

    # global computation agrees and is the true global mean
    assert abs(r0["global_mean"] - 3.0) < 1e-6
    assert abs(r1["global_mean"] - 3.0) < 1e-6

    # only process 0 wrote the checkpoint; it exists exactly once
    assert (out_dir / "ckpt.msgpack").exists()


WORKER_TRAIN = r"""
import json, os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")

from flow2gan_tpu.parallel.mesh import (
    init_distributed, make_mesh, replicate, shard_batch,
)
init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2
assert len(jax.devices()) == 2  # 1 per process

import numpy as np
import jax.numpy as jnp
from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.training.optim import eden2_lr, scaled_adam
from flow2gan_tpu.training.train_step import init_train_state, make_fm_train_step

cfg = get_generator_config("mel_24k_tiny")
model = build_generator(cfg)
mel_fn = LogMelSpectrogram(
    sampling_rate=cfg.sampling_rate, n_fft=cfg.mel_n_fft,
    hop_length=cfg.mel_hop_length, n_mels=cfg.n_mels,
)

L = 2048
key = jax.random.PRNGKey(0)
# the full deterministic GLOBAL batch; each process contributes its half
g_audio = np.asarray(
    0.1 * np.random.RandomState(42).randn(8, L), np.float32
)
local = g_audio[proc_id * 4 : (proc_id + 1) * 4]
init_params = model.init(
    {"params": key, "noise": key, "gate": key, "dropout": key},
    mel_fn(jnp.asarray(g_audio[:2])), jnp.asarray(g_audio[:2]),
    jnp.full((2,), L, jnp.int32), train=True,
)["params"]

mesh = make_mesh()
batch = shard_batch(
    {"audio": local, "audio_lens": np.full((4,), L, np.int32)}, mesh
)
assert batch["audio"].shape == (8, L)

optimizer = scaled_adam(clipping_scale=2.0)
step = make_fm_train_step(
    model, optimizer, lambda b: eden2_lr(0.035, b, 7500.0),
    mel_fn=mel_fn, donate=False,
)
state = init_train_state(replicate(init_params, mesh), optimizer)
losses = []
for i in range(2):
    state, metrics = step(state, batch, jax.random.PRNGKey(123))
    losses.append(float(metrics["loss"]))

report = {"process_index": jax.process_index(), "losses": losses}
if jax.process_index() == 0:
    from flow2gan_tpu.training.checkpoint import save_checkpoint
    save_checkpoint(
        os.path.join(out_dir, "train_params.msgpack"),
        params=jax.tree.map(np.asarray, state.params),
        train_params={"batch_idx_train": 2},
    )
with open(os.path.join(out_dir, f"train_report_{proc_id}.json"), "w") as f:
    json.dump(report, f)
print("WORKER_OK", proc_id)
"""


def test_two_process_fm_train_step(tmp_path):
    """A REAL jitted FM train step over the 2-process global mesh (VERDICT r3
    #4): sharded ScaledAdam updates with cross-host gradient collectives must
    match a single-process run of the same global batch to f32 tolerance —
    the replacement for the reference's DDP all-reduce
    (ref bin/pretrain.py:792)."""
    sys.path.insert(0, str(REPO))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    worker_py = tmp_path / "worker_train.py"
    worker_py.write_text(WORKER_TRAIN)

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    inherited = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    # ONE device per process: the smallest mesh that still exercises
    # cross-host gradient collectives (GSPMD compile over 2 procs x 4 devs
    # can exceed 7 min on a contended host)
    env["XLA_FLAGS"] = " ".join(
        ["--xla_force_host_platform_device_count=1"] + inherited
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), str(port), str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out

    r0 = json.loads((out_dir / "train_report_0.json").read_text())
    r1 = json.loads((out_dir / "train_report_1.json").read_text())
    # both processes observe the same global loss trajectory
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)

    # ---- single-process reference: same init, same global batch, same rng
    import jax
    import jax.numpy as jnp

    from flow2gan_tpu.models import build_generator, get_generator_config
    from flow2gan_tpu.ops.mel import LogMelSpectrogram
    from flow2gan_tpu.training.checkpoint import load_checkpoint
    from flow2gan_tpu.training.optim import eden2_lr, scaled_adam
    from flow2gan_tpu.training.train_step import (
        init_train_state,
        make_fm_train_step,
    )

    cfg = get_generator_config("mel_24k_tiny")
    model = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg.sampling_rate, n_fft=cfg.mel_n_fft,
        hop_length=cfg.mel_hop_length, n_mels=cfg.n_mels,
    )
    L = 2048
    key = jax.random.PRNGKey(0)
    g_audio = np.asarray(0.1 * np.random.RandomState(42).randn(8, L), np.float32)
    init_params = model.init(
        {"params": key, "noise": key, "gate": key, "dropout": key},
        mel_fn(jnp.asarray(g_audio[:2])), jnp.asarray(g_audio[:2]),
        jnp.full((2,), L, jnp.int32), train=True,
    )["params"]
    optimizer = scaled_adam(clipping_scale=2.0)
    step = make_fm_train_step(
        model, optimizer, lambda b: eden2_lr(0.035, b, 7500.0),
        mel_fn=mel_fn, donate=False,
    )
    state = init_train_state(init_params, optimizer)
    batch = {
        "audio": jnp.asarray(g_audio),
        "audio_lens": jnp.full((8,), L, jnp.int32),
    }
    ref_losses = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(123))
        ref_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(r0["losses"], ref_losses, rtol=2e-5)
    mp_tree = load_checkpoint(out_dir / "train_params.msgpack")["model"]
    import flax

    mp_params = flax.serialization.from_state_dict(state.params, mp_tree)
    for sp, mp in zip(jax.tree.leaves(state.params), jax.tree.leaves(mp_params)):
        np.testing.assert_allclose(
            np.asarray(sp), np.asarray(mp), rtol=2e-4, atol=2e-6
        )


WORKER_GAN = r"""
import json, os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")

from flow2gan_tpu.parallel.mesh import (
    init_distributed, make_mesh, replicate, shard_batch,
)
init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
from flow2gan_tpu.models import build_generator, get_generator_config
from flow2gan_tpu.models.discriminators import Discriminators
from flow2gan_tpu.models.gan import make_mel_recon_fns
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.training.optim import eden2_lr, scaled_adam
from flow2gan_tpu.training.gan_step import init_gan_train_state, make_gan_steps

cfg = dict(get_generator_config("mel_24k_tiny"))
cfg["branch_dropout"] = 0.0
generator = build_generator(cfg)
mel_fn = LogMelSpectrogram(
    sampling_rate=cfg["sampling_rate"], n_fft=cfg["mel_n_fft"],
    hop_length=cfg["mel_hop_length"], n_mels=cfg["n_mels"],
)
discriminators = Discriminators(periods=(2, 3), fft_sizes=(256, 128))
mel_recon_fns = make_mel_recon_fns(
    cfg["sampling_rate"], mel_recon_n_ffts=(64, 128), mel_recon_n_mels=(10, 20)
)

L = 2048
key = jax.random.PRNGKey(0)
g_audio = np.asarray(0.1 * np.random.RandomState(42).randn(8, L), np.float32)
local = g_audio[proc_id * 4 : (proc_id + 1) * 4]
params_g = generator.init(
    {"params": key, "noise": key, "gate": key, "dropout": key},
    mel_fn(jnp.asarray(g_audio[:2])), jnp.asarray(g_audio[:2]),
    jnp.full((2,), L, jnp.int32), train=True,
)["params"]
params_d = discriminators.init(
    jax.random.PRNGKey(5), jnp.asarray(g_audio[:2]), jnp.asarray(g_audio[:2])
)["params"]

mesh = make_mesh()
batch = shard_batch(
    {"audio": local, "audio_lens": np.full((4,), L, np.int32)}, mesh
)
assert batch["audio"].shape == (8, L)

opt_g = scaled_adam(clipping_scale=2.0)
opt_d = scaled_adam(clipping_scale=2.0)
d_step, g_step, _ = make_gan_steps(
    generator, discriminators, mel_fn, mel_recon_fns, opt_g, opt_d,
    lr_g_fn=lambda b: eden2_lr(0.002, b, 20000.0),
    lr_d_fn=lambda b: eden2_lr(0.02, b, 5000.0),
    n_timesteps=1, donate=False,
)
state = init_gan_train_state(
    replicate(params_g, mesh), replicate(params_d, mesh), opt_g, opt_d
)
rng = jax.random.PRNGKey(123)
state, md = d_step(state, batch, rng)
state, mg = g_step(state, batch, rng)

report = {
    "process_index": jax.process_index(),
    "loss_d": float(md["loss_d"]),
    "loss_g": float(mg["loss_g"]),
}
if jax.process_index() == 0:
    from flow2gan_tpu.training.checkpoint import save_checkpoint
    save_checkpoint(
        os.path.join(out_dir, "gan_params.msgpack"),
        params={
            "generator": jax.tree.map(np.asarray, state.params_g),
            "discriminator": jax.tree.map(np.asarray, state.params_d),
        },
        train_params={"batch_idx_train": 2},
    )
with open(os.path.join(out_dir, f"gan_report_{proc_id}.json"), "w") as f:
    json.dump(report, f)
print("WORKER_OK", proc_id)
"""


def test_two_process_gan_train_step(tmp_path):
    """One D step + one G step over a REAL 2-process mesh (VERDICT r4 #8):
    cross-host gradients through BOTH ScaledAdam optimizers must match a
    single-process run of the same global batch — the GAN analogue of
    test_two_process_fm_train_step, replacing the reference's
    DDP(find_unused_parameters=True) (ref bin/finetune.py:915)."""
    sys.path.insert(0, str(REPO))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    worker_py = tmp_path / "worker_gan.py"
    worker_py.write_text(WORKER_GAN)

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    inherited = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    env["XLA_FLAGS"] = " ".join(
        ["--xla_force_host_platform_device_count=1"] + inherited
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), str(port), str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out

    r0 = json.loads((out_dir / "gan_report_0.json").read_text())
    r1 = json.loads((out_dir / "gan_report_1.json").read_text())
    np.testing.assert_allclose(r0["loss_d"], r1["loss_d"], rtol=1e-6)
    np.testing.assert_allclose(r0["loss_g"], r1["loss_g"], rtol=1e-6)

    # ---- single-process reference: same init, same global batch, same rng
    import jax
    import jax.numpy as jnp

    from flow2gan_tpu.models import build_generator, get_generator_config
    from flow2gan_tpu.models.discriminators import Discriminators
    from flow2gan_tpu.models.gan import make_mel_recon_fns
    from flow2gan_tpu.ops.mel import LogMelSpectrogram
    from flow2gan_tpu.training.checkpoint import load_checkpoint
    from flow2gan_tpu.training.gan_step import (
        init_gan_train_state,
        make_gan_steps,
    )
    from flow2gan_tpu.training.optim import eden2_lr, scaled_adam

    cfg = dict(get_generator_config("mel_24k_tiny"))
    cfg["branch_dropout"] = 0.0
    generator = build_generator(cfg)
    mel_fn = LogMelSpectrogram(
        sampling_rate=cfg["sampling_rate"], n_fft=cfg["mel_n_fft"],
        hop_length=cfg["mel_hop_length"], n_mels=cfg["n_mels"],
    )
    discriminators = Discriminators(periods=(2, 3), fft_sizes=(256, 128))
    mel_recon_fns = make_mel_recon_fns(
        cfg["sampling_rate"], mel_recon_n_ffts=(64, 128),
        mel_recon_n_mels=(10, 20),
    )
    L = 2048
    key = jax.random.PRNGKey(0)
    g_audio = np.asarray(0.1 * np.random.RandomState(42).randn(8, L), np.float32)
    params_g = generator.init(
        {"params": key, "noise": key, "gate": key, "dropout": key},
        mel_fn(jnp.asarray(g_audio[:2])), jnp.asarray(g_audio[:2]),
        jnp.full((2,), L, jnp.int32), train=True,
    )["params"]
    params_d = discriminators.init(
        jax.random.PRNGKey(5), jnp.asarray(g_audio[:2]), jnp.asarray(g_audio[:2])
    )["params"]
    opt_g = scaled_adam(clipping_scale=2.0)
    opt_d = scaled_adam(clipping_scale=2.0)
    d_step, g_step, _ = make_gan_steps(
        generator, discriminators, mel_fn, mel_recon_fns, opt_g, opt_d,
        lr_g_fn=lambda b: eden2_lr(0.002, b, 20000.0),
        lr_d_fn=lambda b: eden2_lr(0.02, b, 5000.0),
        n_timesteps=1, donate=False,
    )
    state = init_gan_train_state(params_g, params_d, opt_g, opt_d)
    rng = jax.random.PRNGKey(123)
    batch = {
        "audio": jnp.asarray(g_audio),
        "audio_lens": jnp.full((8,), L, jnp.int32),
    }
    state, md = d_step(state, batch, rng)
    state, mg = g_step(state, batch, rng)
    np.testing.assert_allclose(r0["loss_d"], float(md["loss_d"]), rtol=2e-5)
    np.testing.assert_allclose(r0["loss_g"], float(mg["loss_g"]), rtol=2e-5)

    import flax

    mp_tree = load_checkpoint(out_dir / "gan_params.msgpack")["model"]
    ref = {"generator": state.params_g, "discriminator": state.params_d}
    mp_params = flax.serialization.from_state_dict(ref, mp_tree)
    # cross-device psum reduction order differs from the single-device sum;
    # ScaledAdam's early-step rsqrt scale estimates amplify that float noise
    # (same tolerance rationale as test_parallel._trees_close)
    for sp, mp in zip(jax.tree.leaves(ref), jax.tree.leaves(mp_params)):
        np.testing.assert_allclose(
            np.asarray(sp), np.asarray(mp), rtol=8e-3, atol=4e-4
        )
