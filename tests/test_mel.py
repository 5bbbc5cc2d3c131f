"""Mel-frontend parity against the reference's bundled fixtures.

`test_data/mel/*.pt` in the reference repo were produced by its torchaudio
LogMelSpectrogram from `test_data/wav/*.wav` (reference test_from_mel.py /
test_from_wav.py). Matching them validates the whole chain:
wav decode -> reflect-pad STFT -> |.| -> HTK mel filterbank -> safe_log.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from flow2gan_tpu.data.audio_io import read_wav
from flow2gan_tpu.ops.mel import (
    LinearFilterSpectrogram,
    LogMelSpectrogram,
    linear_fbanks,
    melscale_fbanks,
)


@pytest.mark.parametrize(
    "name", ["1089_134686_000001_000001", "1089_134686_000002_000000"]
)
def test_logmel_matches_reference_fixture_24k(reference_dir, name):
    audio, sr = read_wav(reference_dir / "test_data" / "wav" / f"{name}.wav")
    assert sr == 24000
    ref_mel = torch.load(
        reference_dir / "test_data" / "mel" / f"{name}.pt", map_location="cpu"
    )
    ref_mel = ref_mel.numpy()
    if ref_mel.ndim == 3:
        ref_mel = ref_mel[0]

    mel_fn = LogMelSpectrogram(
        sampling_rate=24000, n_fft=1024, hop_length=256, n_mels=100
    )
    ours = np.asarray(mel_fn(jnp.asarray(audio)))[0]

    _assert_logmel_close(ours, ref_mel)


def _assert_logmel_close(ours, ref_mel):
    assert ours.shape == ref_mel.shape, (ours.shape, ref_mel.shape)
    err = np.abs(ours - ref_mel)
    # log-domain error is |d(linear)|/linear: near the 1e-7 safe_log clip floor
    # float32 FFT noise is amplified, so gate tolerance by loudness.
    audible = ref_mel > np.log(1e-5)
    assert err[audible].max() < 2e-3, f"audible-bin log-mel err {err[audible].max()}"
    assert err.max() < 5e-2, f"max abs log-mel err {err.max()}"
    assert err.mean() < 2e-4, f"mean abs log-mel err {err.mean()}"


def test_logmel_matches_reference_fixture_44k(reference_dir):
    audio, sr = read_wav(reference_dir / "test_data" / "wav_44k" / "mixture.wav")
    assert sr == 44100
    audio = audio.mean(axis=0, keepdims=True)  # stereo fixture: mono mixdown
    ref_mel = torch.load(
        reference_dir / "test_data" / "mel_44k_128band_512x" / "mixture.pt",
        map_location="cpu",
    ).numpy()
    if ref_mel.ndim == 3:
        ref_mel = ref_mel[0]

    mel_fn = LogMelSpectrogram(
        sampling_rate=44100, n_fft=2048, hop_length=512, n_mels=128
    )
    ours = np.asarray(mel_fn(jnp.asarray(audio)))[0]
    _assert_logmel_close(ours, ref_mel)


def test_melscale_fbanks_properties():
    fb = melscale_fbanks(513, 0.0, 12000.0, 100, 24000)
    assert fb.shape == (513, 100)
    assert fb.min() >= 0.0
    # every filter has nonzero mass; peaks are at most 1
    assert (fb.sum(axis=0) > 0).all()
    assert fb.max() <= 1.0 + 1e-6


def test_linear_fbanks_properties():
    fb = linear_fbanks(513, 0.0, 12000.0, 256, 24000)
    assert fb.shape == (513, 256)
    # linear triangles are evenly spaced: centers differ by a constant
    centers = fb.argmax(axis=0)
    diffs = np.diff(centers.astype(np.int64))
    assert diffs.min() >= 1 and diffs.max() - diffs.min() <= 1


def test_linear_filter_spectrogram_shape():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 24000).astype(np.float32))
    spec_fn = LinearFilterSpectrogram(
        sample_rate=24000, n_filter=256, n_fft=1024, hop_length=256, power=2.0
    )
    out = spec_fn(x)
    assert out.shape == (2, 256, 1 + 24000 // 256)
    assert np.isfinite(np.asarray(out)).all()
