"""Unit tests for the streaming chunked-inference halo logic
(flow2gan_tpu/bin/infer_dir.py streaming_infer)."""

import numpy as np

from flow2gan_tpu.bin.infer_dir import streaming_infer


def _frame_local_synth(hop):
    """A fake synth that's perfectly frame-local: sample j of frame i equals
    the frame's first mel value. With such a model, streaming with any halo
    must reproduce the non-streamed output exactly."""

    def synth(params, cond):
        cond = np.asarray(cond)  # (1, n_mels, frames)
        vals = cond[:, 0, :]  # (1, frames)
        return np.repeat(vals, hop, axis=-1)

    return synth


def test_streaming_equals_full_for_local_model():
    hop = 4
    frames = 37
    rng = np.random.RandomState(0)
    mel = rng.randn(3, frames).astype(np.float32)
    synth = _frame_local_synth(hop)
    full = synth(None, mel[None])[0]
    for chunk in (5, 10, 37, 64):
        out = streaming_infer(synth, None, mel, chunk, num_layers=2, hop=hop)
        assert out.shape == full.shape, (chunk, out.shape, full.shape)
        np.testing.assert_array_equal(out, full)


def test_streaming_output_length_various_sizes():
    hop = 8
    synth = _frame_local_synth(hop)
    for frames in (1, 7, 100, 101):
        mel = np.ones((2, frames), np.float32)
        out = streaming_infer(synth, None, mel, 16, num_layers=8, hop=hop)
        assert out.shape == (frames * hop,)
