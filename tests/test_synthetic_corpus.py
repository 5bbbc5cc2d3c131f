"""Tests for scripts/make_synthetic_corpus.py — the generalization-rehearsal
data source (results/r4_generalization).

The artifact's claim ("held-out test audio the model has never seen") rests
on two properties of the generator: per-utterance determinism (the committed
drive is reproducible) and disjoint train/test parameter draws. Both are
pinned here. Mirrors the reference's held-out evaluation protocol
(/root/reference/README.md:19, run_libritts.sh stage 5) at rehearsal scale.
"""

import importlib.util
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "make_synthetic_corpus.py"

spec = importlib.util.spec_from_file_location("make_synthetic_corpus", SCRIPT)
msc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(msc)


def test_synth_deterministic_and_bounded():
    a = msc.synth_utterance(seed=5, sr=24000, duration=0.3)
    b = msc.synth_utterance(seed=5, sr=24000, duration=0.3)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32
    assert a.shape == (int(0.3 * 24000),)
    assert np.isfinite(a).all()
    assert 0.3 < np.abs(a).max() <= 0.9  # normalized into [0.5, 0.89]


def test_distinct_seeds_produce_distinct_audio():
    a = msc.synth_utterance(seed=7, sr=24000, duration=0.3)
    b = msc.synth_utterance(seed=8, sr=24000, duration=0.3)
    # different parameter draws => decorrelated waveforms
    r = np.corrcoef(a, b)[0, 1]
    assert abs(r) < 0.5
    assert np.abs(a - b).max() > 0.1


def test_corpus_layout_manifests_and_disjoint_splits(tmp_path):
    corpus = tmp_path / "LibriTTS"
    data = tmp_path / "manifests"
    subprocess.run(
        [sys.executable, str(SCRIPT),
         "--corpus-dir", str(corpus), "--data-dir", str(data),
         "--n-train", "3", "--n-test", "2", "--n-dev", "1",
         "--duration", "0.2", "--train-repeat", "2"],
        check=True, cwd=REPO,
    )
    from flow2gan_tpu.data.dataset import read_recording_manifest

    train = read_recording_manifest(
        data / "libritts_recordings_train_clean_100.jsonl.gz")
    test = read_recording_manifest(
        data / "libritts_recordings_test_clean.jsonl.gz")
    dev = read_recording_manifest(
        data / "libritts_recordings_dev_clean.jsonl.gz")

    # train-repeat multiplies manifest entries, not files on disk
    assert len(train) == 6 and len(test) == 2 and len(dev) == 1
    assert len({r.id for r in train}) == 6
    assert len({r.path for r in train}) == 3
    assert len(list((corpus / "train-clean-100").rglob("*.wav"))) == 3
    assert len(list((corpus / "test-clean").rglob("*.wav"))) == 2

    # splits are disjoint: no shared files, and the audio itself differs
    # (seed ranges are 100k apart)
    train_paths = {r.path for r in train}
    assert train_paths.isdisjoint({r.path for r in test})
    from flow2gan_tpu.data.audio_io import read_wav

    tr0, _ = read_wav(sorted(train_paths)[0])
    te0, _ = read_wav(test[0].path)
    assert np.abs(tr0[: len(te0)] - te0[: len(tr0)]).max() > 0.1

    # disk audio round-trips the deterministic generator (16-bit quantization)
    regen = msc.synth_utterance(seed=100_000, sr=24000, duration=0.2)
    assert np.abs(te0 - regen).max() < 2.0 / 32768.0
