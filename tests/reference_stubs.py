"""Import helper: load the *reference* torch implementation from
/root/reference with stub torchaudio/lhotse modules, for use as a golden
oracle in parity tests.

The stubs only provide what module construction needs (classes exist, the
linear filterbank is real so `loss_spec.fb` buffers match); anything the
oracle actually computes in our tests goes through plain torch ops
(torch.stft / istft / convs), which are real.
"""

import sys
import types

import numpy as np
import torch


def install_stubs():
    if "torchaudio" in sys.modules and not getattr(
        sys.modules["torchaudio"], "_flow2gan_tpu_stub", False
    ):
        return  # real torchaudio present

    from flow2gan_tpu.ops.mel import linear_fbanks as _linear_fbanks
    from flow2gan_tpu.ops.mel import melscale_fbanks as _melscale_fbanks

    ta = types.ModuleType("torchaudio")
    ta._flow2gan_tpu_stub = True
    transforms = types.ModuleType("torchaudio.transforms")
    functional = types.ModuleType("torchaudio.functional")

    class Spectrogram(torch.nn.Module):
        def __init__(
            self,
            n_fft=400,
            win_length=None,
            hop_length=None,
            pad=0,
            window_fn=torch.hann_window,
            power=2.0,
            normalized=False,
            wkwargs=None,
            center=True,
            pad_mode="reflect",
            onesided=True,
        ):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length if win_length is not None else n_fft
            self.hop_length = (
                hop_length if hop_length is not None else self.win_length // 2
            )
            self.power = power
            self.center = center
            self.pad_mode = pad_mode
            self.register_buffer("window", window_fn(self.win_length))

        def forward(self, x):
            shape = x.shape
            x = x.reshape(-1, shape[-1])
            spec = torch.stft(
                x,
                n_fft=self.n_fft,
                hop_length=self.hop_length,
                win_length=self.win_length,
                window=self.window,
                center=self.center,
                pad_mode=self.pad_mode,
                return_complex=True,
                onesided=True,
            )
            spec = spec.reshape(*shape[:-1], *spec.shape[-2:])
            if self.power is None:
                return spec
            mag = spec.abs()
            if self.power != 1.0:
                mag = mag.pow(self.power)
            return mag

    class MelSpectrogram(torch.nn.Module):
        def __init__(
            self,
            sample_rate=16000,
            n_fft=400,
            hop_length=None,
            n_mels=128,
            center=True,
            power=2.0,
            **kw,
        ):
            super().__init__()
            self.spectrogram = Spectrogram(
                n_fft=n_fft,
                hop_length=hop_length if hop_length is not None else n_fft // 2,
                power=power,
                center=center,
            )
            fb = _melscale_fbanks(
                n_freqs=n_fft // 2 + 1,
                f_min=0.0,
                f_max=float(sample_rate // 2),
                n_mels=n_mels,
                sample_rate=sample_rate,
            )
            self.register_buffer("fb", torch.from_numpy(np.asarray(fb)))

        def forward(self, x):
            spec = self.spectrogram(x)
            return torch.matmul(spec.transpose(-1, -2), self.fb).transpose(-1, -2)

    def linear_fbanks(n_freqs, f_min, f_max, n_filter, sample_rate):
        fb = _linear_fbanks(
            n_freqs=n_freqs,
            f_min=f_min,
            f_max=f_max,
            n_filter=n_filter,
            sample_rate=sample_rate,
        )
        return torch.from_numpy(np.asarray(fb))

    transforms.Spectrogram = Spectrogram
    transforms.MelSpectrogram = MelSpectrogram
    functional.linear_fbanks = linear_fbanks
    ta.transforms = transforms
    ta.functional = functional
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = transforms
    sys.modules["torchaudio.functional"] = functional

    # lhotse stubs (reference checkpoint.py / optim.py import these at top)
    lhotse = types.ModuleType("lhotse")
    lhotse_utils = types.ModuleType("lhotse.utils")
    lhotse_dataset = types.ModuleType("lhotse.dataset")
    lhotse_sampling = types.ModuleType("lhotse.dataset.sampling")
    lhotse_sampling_base = types.ModuleType("lhotse.dataset.sampling.base")

    def fix_random_seed(seed):
        torch.manual_seed(seed)
        np.random.seed(seed % (2**32))

    class CutSampler:  # only used in type annotations / isinstance checks
        pass

    lhotse_utils.fix_random_seed = fix_random_seed
    lhotse_sampling_base.CutSampler = CutSampler
    lhotse.utils = lhotse_utils
    lhotse.RecordingSet = object
    sys.modules.setdefault("lhotse", lhotse)
    sys.modules.setdefault("lhotse.utils", lhotse_utils)
    sys.modules.setdefault("lhotse.dataset", lhotse_dataset)
    sys.modules.setdefault("lhotse.dataset.sampling", lhotse_sampling)
    sys.modules.setdefault("lhotse.dataset.sampling.base", lhotse_sampling_base)


def import_reference():
    """Install stubs, put /root/reference on sys.path, import `flow2gan`."""
    install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import flow2gan  # noqa: F401

    return flow2gan
