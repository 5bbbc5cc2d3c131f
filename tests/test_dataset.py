"""Data pipeline tests using real reference test_data wavs + synthetic files."""

import numpy as np
import pytest

from flow2gan_tpu.data.audio_io import read_wav, write_wav
from flow2gan_tpu.data.dataset import (
    DataLoader,
    Recording,
    RecordingDataset,
    build_data_loader,
    pad_collate,
    read_recording_manifest,
    scan_dir_to_recordings,
    write_recording_manifest,
)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory, reference_dir):
    """A small corpus: 2 real speech files + 1 silent file + 1 low-rate file."""
    d = tmp_path_factory.mktemp("corpus")
    for name in ["1089_134686_000001_000001", "1089_134686_000002_000000"]:
        a, sr = read_wav(reference_dir / "test_data" / "wav" / f"{name}.wav")
        write_wav(d / f"{name}.wav", a[0], sr)
    write_wav(d / "silent.wav", np.zeros(48000, np.float32), 24000)
    t = np.arange(32000) / 16000.0
    write_wav(d / "tone16k.wav", 0.5 * np.sin(2 * np.pi * 220 * t), 16000)
    return d


def test_scan_and_manifest_roundtrip(wav_dir, tmp_path):
    recs = scan_dir_to_recordings(wav_dir)
    assert len(recs) == 4
    manifest = tmp_path / "recordings.jsonl.gz"
    write_recording_manifest(recs, manifest)
    recs2 = read_recording_manifest(manifest)
    assert [r.id for r in recs] == [r.id for r in recs2]
    assert all(r.num_samples == r2.num_samples for r, r2 in zip(recs, recs2))


def test_train_crops_fixed_length_and_nonsilent(wav_dir):
    recs = scan_dir_to_recordings(wav_dir)
    ds = RecordingDataset(
        recs, sampling_rate=24000, train=True, duration=1.5, max_load_times=3
    )
    for i in range(len(ds)):
        audio, silence, name = ds.__getitem__(i, epoch=0)
        assert audio.ndim == 1
        assert len(audio) == 36000  # 1.5 s at 24 kHz
        if "silent" in name:
            assert silence
        if "tone16k" in name:
            # resampled from 16 kHz: length preserved in seconds
            assert not silence


def test_gain_normalization(wav_dir):
    recs = [r for r in scan_dir_to_recordings(wav_dir) if "tone" in r.id]
    ds = RecordingDataset(recs, sampling_rate=24000, train=False, duration=1.0)
    audio, _, _ = ds.__getitem__(0)
    peak_db = 20 * np.log10(np.abs(audio).max())
    assert abs(peak_db - (-3.0)) < 0.5  # eval: fixed -3 dB peak normalize


def test_collate_drops_silent_and_keeps_shape():
    items = [
        (np.ones(100, np.float32), False, "a"),
        (np.zeros(100, np.float32), True, "b"),
        (np.ones(80, np.float32), False, "c"),
    ]
    batch = pad_collate(items, fixed_length=100)
    assert batch["audio"].shape == (3, 100)  # refilled to original batch size
    assert "b" not in batch["file_names"]
    assert batch["audio_lens"].tolist() == [100, 80, 100]


def test_collate_all_silent_fallback():
    items = [(np.zeros(10, np.float32), True, "s1"), (np.zeros(10, np.float32), True, "s2")]
    batch = pad_collate(items, fixed_length=10)
    assert batch["audio"].shape[0] >= 1


def test_loader_epoch_determinism_and_sharding(wav_dir):
    recs = scan_dir_to_recordings(wav_dir)
    loader = build_data_loader(
        recs, sampling_rate=24000, batch_size=2, train=True, duration=1.0, seed=3
    )
    loader.set_epoch(1)
    b1 = [b["file_names"] for b in loader]
    loader2 = build_data_loader(
        recs, sampling_rate=24000, batch_size=2, train=True, duration=1.0, seed=3
    )
    loader2.set_epoch(1)
    b2 = [b["file_names"] for b in loader2]
    assert b1 == b2
    # reshuffle across epochs: check on a large index set (a 4-element
    # permutation can collide between epochs)
    big = DataLoader(loader.dataset, batch_size=2, shuffle=True, seed=3)
    big.dataset = type("D", (), {"__len__": lambda self: 100})()
    big.set_epoch(1)
    i1 = big._indices().tolist()
    big.set_epoch(2)
    i2 = big._indices().tolist()
    assert i1 != i2  # reshuffled
    assert sorted(i1) == sorted(i2)

    # 2-way process sharding covers the dataset disjointly
    ds = loader.dataset
    l0 = DataLoader(ds, batch_size=2, process_index=0, process_count=2)
    l1 = DataLoader(ds, batch_size=2, process_index=1, process_count=2)
    names0 = [n for b in l0 for n in b["file_names"]]
    names1 = [n for b in l1 for n in b["file_names"]]
    assert not set(names0) & set(names1)
    assert len(names0) + len(names1) == len(ds)


def test_eval_bucket_padding(wav_dir):
    recs = scan_dir_to_recordings(wav_dir)
    loader = build_data_loader(
        recs, sampling_rate=24000, batch_size=4, train=False
    )
    batch = next(iter(loader))
    assert batch["audio"].shape[1] % 4096 == 0  # bucketed to bound recompiles
    assert batch["audio_lens"].max() <= batch["audio"].shape[1]


def test_eval_loader_with_duration_pads_to_fixed_length(wav_dir):
    """Eval loaders with a duration must pad every batch to the SAME fixed
    length: multi-host validation assembles a global array from each
    process's local batch, so per-host bucketed-max padding would give
    divergent global shapes across hosts (and recompile eval_step per
    bucket)."""
    recs = scan_dir_to_recordings(wav_dir)
    loader = build_data_loader(
        recs, sampling_rate=24000, batch_size=2, train=False, duration=0.7
    )
    shapes = {b["audio"].shape[1] for b in loader}
    assert shapes == {int(0.7 * 24000)}


def test_high_epoch_seed_no_overflow(wav_dir):
    """Regression: (seed + 31*epoch)*1e6 + idx exceeded RandomState's 2**32
    limit at epoch >= 138 of the default recipe."""
    recs = scan_dir_to_recordings(wav_dir)
    ds = RecordingDataset(recs, sampling_rate=24000, train=True, duration=0.5,
                          seed=42)
    audio, silence, name = ds.__getitem__(0, epoch=200)
    assert audio.shape == (12000,)


def test_mid_epoch_resume_continues_stream(wav_dir):
    """Loader state_dict/load_state_dict: resuming mid-epoch continues the
    data stream where the checkpoint left off, not from the epoch start
    (reference persists the lhotse sampler, checkpoint.py:40-108)."""
    recs = scan_dir_to_recordings(wav_dir)
    loader = build_data_loader(
        recs, sampling_rate=24000, batch_size=1, train=True, duration=1.0, seed=3
    )
    loader.set_epoch(2)
    full = [b["file_names"] for b in loader]
    assert len(full) >= 3

    loader.set_epoch(2)
    it = iter(loader)
    consumed = [next(it)["file_names"], next(it)["file_names"]]
    snap = loader.state_dict()
    del it
    assert snap == {"epoch": 2, "consumed": 2}
    assert consumed == full[:2]

    resumed = build_data_loader(
        recs, sampling_rate=24000, batch_size=1, train=True, duration=1.0, seed=3
    )
    resumed.load_state_dict(snap)
    rest = [b["file_names"] for b in resumed]
    assert rest == full[2:], "stream must continue, not replay"
    # a following epoch starts fresh
    resumed.set_epoch(3)
    assert resumed.state_dict() == {"epoch": 3, "consumed": 0}
    assert len([b for b in resumed]) == len(full)


def test_sampler_snapshot_roundtrip_through_msgpack(wav_dir, tmp_path):
    """The pretrain sampler snapshot (incl. python Random state) must survive
    the msgpack checkpoint format bit-exactly."""
    import random

    from flow2gan_tpu.bin.pretrain import (
        restore_sampler_state,
        sampler_state_snapshot,
    )
    from flow2gan_tpu.training import checkpoint as ckpt

    recs = scan_dir_to_recordings(wav_dir)
    dl = build_data_loader(
        recs, sampling_rate=24000, batch_size=1, train=True, duration=1.0, seed=3
    )
    dl.set_epoch(4)
    it = iter(dl)
    next(it)
    del it
    rng_py = random.Random(123)
    rng_py.random()  # advance
    snap = sampler_state_snapshot(4, [dl], rng_py)
    expected_next = rng_py.random()

    path = tmp_path / "ckpt.msgpack"
    ckpt.save_checkpoint(
        path, params={"w": np.zeros(1, np.float32)}, sampler_state=snap
    )
    loaded = ckpt.load_checkpoint(path)
    epoch, rng2 = restore_sampler_state(loaded["sampler"], [dl])
    assert epoch == 4
    assert dl.state_dict() == {"epoch": 4, "consumed": 1}
    assert rng2.random() == expected_next


def test_reiterating_loader_without_set_epoch_replays(wav_dir):
    """Regression (ADVICE r2, high): re-iterating a loader to natural
    exhaustion must replay the epoch, not yield zero batches. Validation
    loaders are re-iterated every valid_interval without set_epoch; before
    the fix every pass after the first was empty (inf valid loss)."""
    recs = scan_dir_to_recordings(wav_dir)
    loader = build_data_loader(
        recs, sampling_rate=24000, batch_size=1, train=True, duration=1.0, seed=3
    )
    first = [b["file_names"] for b in loader]
    second = [b["file_names"] for b in loader]
    assert len(first) >= 3
    assert second == first  # replay, not empty


def test_eval_loader_not_resumable(wav_dir):
    """Eval loaders (train=False) must not track a resume position at all:
    an early break (e.g. next(iter(dl)) to grab a test batch, pretrain) must
    not skip batches on the following full pass."""
    recs = scan_dir_to_recordings(wav_dir)
    loader = build_data_loader(recs, sampling_rate=24000, batch_size=1, train=False)
    assert not loader.resumable
    peeked = next(iter(loader))  # early break: iterator abandoned mid-epoch
    full = [b["file_names"] for b in loader]
    assert full[0] == peeked["file_names"]  # first batch NOT skipped
    again = [b["file_names"] for b in loader]
    assert again == full
