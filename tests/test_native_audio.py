"""Native C++ WAV loader: builds with g++ and matches the Python reader."""

import numpy as np
import pytest

from flow2gan_tpu.data import native_audio
from flow2gan_tpu.data.audio_io import read_wav, write_wav


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory, reference_dir):
    a, sr = read_wav(reference_dir / "test_data" / "wav" / "1089_134686_000002_000000.wav")
    d = tmp_path_factory.mktemp("native")
    p = d / "sample.wav"
    write_wav(p, a[0], sr)
    audio, _ = read_wav(p)  # compare against the re-read (post-quantization)
    return p, audio[0], sr


def test_native_builds(wav_file):
    assert native_audio.available(), "g++ toolchain should build the loader"


def test_wav_info(wav_file):
    p, audio, sr = wav_file
    info = native_audio.wav_info(p)
    assert info is not None
    assert info[0] == sr
    assert info[1] == len(audio)
    assert info[2] == 1


def test_crop_matches_python_reader(wav_file):
    p, audio, sr = wav_file
    crop = native_audio.read_crop_mono(p, 1000, 4000)
    assert crop is not None and crop.shape == (4000,)
    np.testing.assert_allclose(crop, audio[1000:5000], atol=1e-6)


def test_crop_clipping_past_eof(wav_file):
    p, audio, sr = wav_file
    crop = native_audio.read_crop_mono(p, len(audio) - 100, 500)
    assert crop is not None and crop.shape == (100,)
    np.testing.assert_allclose(crop, audio[-100:], atol=1e-6)


def test_stereo_mixdown(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    left = 0.5 * np.sin(2 * np.pi * 220 * t)
    right = 0.25 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([left, right])
    p = tmp_path / "stereo.wav"
    write_wav(p, stereo, sr)
    crop = native_audio.read_crop_mono(p, 0, sr)
    ref, _ = read_wav(p)
    np.testing.assert_allclose(crop, ref.mean(axis=0), atol=1e-5)


def test_native_peak_normalize(wav_file):
    p, audio, sr = wav_file
    x = np.asarray(audio[:8000], np.float32).copy()
    out = native_audio.peak_normalize_db_(x, -3.0)
    peak_db = 20 * np.log10(np.abs(out).max())
    assert abs(peak_db - (-3.0)) < 0.01


def test_dataset_uses_native_path(wav_file, tmp_path):
    from flow2gan_tpu.data.dataset import RecordingDataset, scan_dir_to_recordings

    p, audio, sr = wav_file
    recs = scan_dir_to_recordings(p.parent)
    ds = RecordingDataset(recs, sampling_rate=sr, train=True, duration=0.1)
    a, silence, name = ds.__getitem__(0, epoch=0)
    assert a.shape == (int(0.1 * sr),)
    assert np.isfinite(a).all()
