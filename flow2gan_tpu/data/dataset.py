"""Host-side data pipeline: recording manifests -> fixed-shape numpy batches.

Re-designs /root/reference/flow2gan/dataset.py (lhotse RecordingSet + torch
DataLoader + sox effects) dependency-free and TPU-shaped:

- reads lhotse-format `recordings.jsonl[.gz]` manifests (so existing data
  prep interoperates) as well as plain filelists / directory scans;
- training: random `duration`-second crops, retrying up to `max_load_times`
  when crop RMS < 0.005 ("silence", reference dataset.py:130-153), mono
  mixdown, sox-`norm`-style gain augmentation (random -1..-6 dB train, fixed
  -3 dB eval; reference dataset.py:164-168), polyphase resample;
- batches are FIXED SHAPE for training (crops are constant length) and
  bucket-padded for eval, so the jitted step never recompiles;
- multi-process sharding by jax process index (replaces DistributedSampler)
  and a thread-pool prefetching loader (audio decode releases the GIL in
  numpy/IO).
"""

from __future__ import annotations

import dataclasses
import gzip
import json
import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Union

import numpy as np

from flow2gan_tpu.data.audio_io import peak_normalize_db, read_wav, resample

Pathlike = Union[str, Path]


@dataclasses.dataclass(frozen=True)
class Recording:
    id: str
    path: str
    sampling_rate: int
    num_samples: int

    @property
    def duration(self) -> float:
        return self.num_samples / self.sampling_rate


def read_recording_manifest(path: Pathlike) -> List[Recording]:
    """Parse a lhotse-style recordings.jsonl[.gz] manifest."""
    path = str(path)
    opener = gzip.open if path.endswith(".gz") else open
    recs = []
    with opener(path, "rt") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            recs.append(
                Recording(
                    id=d["id"],
                    path=d["sources"][0]["source"],
                    sampling_rate=int(d["sampling_rate"]),
                    num_samples=int(d["num_samples"]),
                )
            )
    return recs


def write_recording_manifest(recs: Sequence[Recording], path: Pathlike) -> None:
    path = str(path)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as f:
        for r in recs:
            f.write(
                json.dumps(
                    {
                        "id": r.id,
                        "sources": [
                            {"type": "file", "channels": [0], "source": r.path}
                        ],
                        "sampling_rate": r.sampling_rate,
                        "num_samples": r.num_samples,
                        "duration": r.duration,
                    }
                )
                + "\n"
            )


def scan_dir_to_recordings(
    root: Pathlike, pattern: str = "**/*.wav"
) -> List[Recording]:
    """Build Recordings by scanning a directory (reads WAV headers only)."""
    import struct
    import wave

    recs = []
    for p in sorted(Path(root).glob(pattern)):
        try:
            with wave.open(str(p), "rb") as w:
                sr = w.getframerate()
                n = w.getnframes()
        except (wave.Error, EOFError, struct.error):
            audio, sr = read_wav(p)
            n = audio.shape[-1]
        recs.append(
            Recording(id=p.stem, path=str(p), sampling_rate=sr, num_samples=n)
        )
    return recs


class RecordingDataset:
    """Map-style dataset over recordings (reference LhotseRecordingDataset,
    dataset.py:96-175). __getitem__ -> (audio float32 (T,), silence, name)."""

    def __init__(
        self,
        recordings: Sequence[Recording],
        sampling_rate: int = 24000,
        root_path: Optional[str] = None,
        train: bool = False,
        duration: Optional[float] = None,
        apply_effects: bool = True,
        max_load_times: int = 1,
        min_rms: float = 0.005,
        seed: int = 0,
    ):
        self.recordings = list(recordings)
        self.sampling_rate = sampling_rate
        self.root_path = root_path
        self.train = train
        self.duration = duration
        self.apply_effects = apply_effects
        self.max_load_times = max_load_times
        self.min_rms = min_rms
        self.seed = seed

    def __len__(self) -> int:
        return len(self.recordings)

    def _load_slice(self, rec: Recording, offset_sec: float, dur_sec: float):
        start = int(offset_sec * rec.sampling_rate)
        n = int(dur_sec * rec.sampling_rate)
        # hot path: native C++ decoder reads only the crop (mono f32)
        from flow2gan_tpu.data import native_audio

        crop = native_audio.read_crop_mono(rec.path, start, n)
        if crop is not None:
            return crop[None, :], rec.sampling_rate
        audio, sr = read_wav(rec.path)
        return audio[:, start : start + n], sr

    def __getitem__(self, index: int, epoch: int = 0):
        rec = self.recordings[index]
        rng = np.random.RandomState(
            ((self.seed + 31 * epoch) * 1_000_003 + index) % (2**32)
        )

        fname = rec.path
        if self.root_path is not None:
            import os

            fname = os.path.relpath(fname, self.root_path)

        def is_silence(x):
            return float(np.sqrt(np.mean(x**2))) < self.min_rms

        silence = False
        if self.duration is None:
            y, sr = read_wav(rec.path)
            silence = is_silence(y)
        else:
            duration = min(self.duration, rec.duration)
            if not self.train:
                y, sr = self._load_slice(rec, 0.0, duration)
                silence = is_silence(y)
            else:
                for _ in range(max(1, self.max_load_times)):
                    offset = rng.uniform(0, rec.duration - duration)
                    y, sr = self._load_slice(rec, offset, duration)
                    silence = is_silence(y)
                    if not silence:
                        break

        if y.ndim == 1:
            y = y[None, :]
        if y.shape[0] > 1:
            y = y.mean(axis=0, keepdims=True)

        if self.apply_effects:
            gain = rng.uniform(-1, -6) if self.train else -3.0
            y = peak_normalize_db(y, gain)

        if sr != self.sampling_rate:
            y = resample(y, sr, self.sampling_rate)

        return y[0].astype(np.float32), silence, fname


def _bucket_length(n: int, quantum: int = 4096) -> int:
    """Round up to a length bucket to bound jit recompilations on eval."""
    return ((n + quantum - 1) // quantum) * quantum


def pad_collate(
    items,
    fixed_length: Optional[int] = None,
    filter_silence: bool = True,
    keep_batch_size: bool = True,
    bucket_quantum: int = 4096,
) -> Dict[str, np.ndarray]:
    """Collate (audio, silence, name) items into a padded batch.

    Silent items are dropped like the reference (dataset.py:31-45); with
    `keep_batch_size` the batch is refilled by repeating non-silent items so
    the jitted train step sees a static batch shape (TPU-friendly deviation —
    per-sample loss weighting is unchanged).
    """
    orig_n = len(items)
    if filter_silence:
        kept = [x for x in items if not x[1]]
        if not kept:
            logging.warning(
                "No non-silent audio in the batch, using the first item as fallback."
            )
            kept = list(items[0:1])
    else:
        kept = list(items)
    if keep_batch_size and len(kept) < orig_n:
        reps = [kept[i % len(kept)] for i in range(orig_n - len(kept))]
        kept = kept + reps

    lens = np.asarray([len(x[0]) for x in kept], np.int32)
    if fixed_length is not None:
        max_len = fixed_length
    else:
        max_len = _bucket_length(int(lens.max()), bucket_quantum)
    audios = np.zeros((len(kept), max_len), np.float32)
    for i, (a, _, _) in enumerate(kept):
        audios[i, : min(len(a), max_len)] = a[:max_len]
    lens = np.minimum(lens, max_len)
    return {
        "audio": audios,
        "audio_lens": lens,
        "file_names": [x[2] for x in kept],
    }


class DataLoader:
    """Thread-pool prefetching loader with per-process sharding.

    Replaces torch DataLoader + DistributedSampler (reference
    dataset.py:48-93). Deterministic per (seed, epoch); call set_epoch like
    the reference trainer does.
    """

    def __init__(
        self,
        dataset: RecordingDataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 8,
        drop_last: bool = False,
        fixed_length: Optional[int] = None,
        filter_silence: bool = True,
        seed: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        prefetch: int = 4,
        resumable: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.fixed_length = fixed_length
        self.filter_silence = filter_silence
        self.seed = seed
        self.epoch = 0
        self.prefetch = prefetch
        if process_index is None or process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count
        # resumable=False (eval loaders) disables mid-epoch position
        # tracking entirely: eval loaders are re-iterated every
        # valid_interval without set_epoch, so the resume-skip logic
        # would make every pass after the first yield zero batches.
        self.resumable = resumable
        self._consumed = 0  # batches yielded in the current epoch

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self._consumed = 0

    def state_dict(self) -> Dict[str, int]:
        """Mid-epoch resumable position (reference persists the lhotse
        sampler into checkpoints, ref checkpoint.py:40-108). Batch order is
        deterministic per (seed, epoch), so (epoch, consumed) is sufficient."""
        return {"epoch": self.epoch, "consumed": self._consumed}

    def load_state_dict(self, state: Dict[str, int]) -> None:
        self.epoch = int(state["epoch"])
        self._consumed = int(state["consumed"])

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # strided per-process shard (equal sizes, truncating remainder)
        per = n // self.process_count
        if per == 0:
            return idx  # tiny datasets: every process sees everything
        idx = idx[: per * self.process_count]
        return idx[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        # mid-epoch resume: skip already-consumed batches (load_state_dict);
        # the indices are deterministic per (seed, epoch) so the stream
        # continues exactly where the checkpoint left off.
        if self.resumable and self._consumed:
            batches = batches[self._consumed :]
        if not batches:
            # natural end of the epoch's stream: reset so a re-iteration
            # without set_epoch replays the epoch instead of yielding nothing
            self._consumed = 0
            return

        epoch = self.epoch

        def load_batch(batch_idx_list):
            items = [
                self.dataset.__getitem__(int(i), epoch=epoch)
                for i in batch_idx_list
            ]
            return pad_collate(
                items,
                fixed_length=self.fixed_length,
                filter_silence=self.filter_silence,
            )

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # keep a bounded window of in-flight decodes (an eager submit of
            # the whole epoch would buffer ~GBs of audio on the host)
            window = self.num_workers + self.prefetch
            with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                from collections import deque

                inflight = deque()
                it = iter(batches)
                try:
                    while True:
                        while len(inflight) < window:
                            try:
                                inflight.append(ex.submit(load_batch, next(it)))
                            except StopIteration:
                                break
                        if not inflight:
                            break
                        if stop.is_set():
                            for fut in inflight:
                                fut.cancel()
                            break
                        fut = inflight.popleft()
                        try:
                            out_q.put(fut.result())
                        except Exception as e:  # surface loader errors
                            out_q.put(e)
                finally:
                    out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    # natural exhaustion (distinct from an early consumer
                    # break, which skips this and keeps _consumed for
                    # mid-epoch resume): reset the position so the next
                    # __iter__ replays the epoch from the start even if the
                    # caller forgot set_epoch.
                    self._consumed = 0
                    break
                if isinstance(item, Exception):
                    raise item
                # count BEFORE yielding: once the consumer holds the batch it
                # is consumed, even if iteration stops right after (the
                # trainer checkpoints between next() calls)
                self._consumed += 1
                yield item
        finally:
            stop.set()


def build_data_loader(
    recordings: Sequence[Recording],
    root_path: Optional[str] = None,
    sampling_rate: int = 24000,
    batch_size: int = 256,
    num_workers: int = 8,
    train: bool = False,
    duration: Optional[float] = None,
    apply_effects: bool = True,
    max_load_times: int = 1,
    seed: int = 0,
    drop_last: bool = False,
) -> DataLoader:
    """Mirror of the reference build_data_loader (dataset.py:48-93)."""
    dataset = RecordingDataset(
        recordings=recordings,
        root_path=root_path,
        sampling_rate=sampling_rate,
        train=train,
        duration=duration,
        apply_effects=apply_effects,
        max_load_times=max_load_times,
        seed=seed,
    )
    # Pad to the fixed crop length whenever a duration is given — for eval
    # loaders too: multi-host validation assembles a GLOBAL batch from each
    # process's local arrays (parallel/mesh.py shard_batch), so every process
    # must pad to the same length or the global shapes diverge across hosts
    # (each host would otherwise bucket to its own local max). Also makes
    # eval_step compile exactly once. Full-length loaders (duration=None,
    # bin/infer) keep bucketed dynamic padding.
    fixed_length = int(duration * sampling_rate) if duration is not None else None
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=train,
        num_workers=num_workers,
        drop_last=drop_last,
        fixed_length=fixed_length,
        seed=seed,
        # eval loaders are re-iterated every valid_interval; only train
        # loaders participate in mid-epoch checkpoint/resume
        resumable=train,
    )
