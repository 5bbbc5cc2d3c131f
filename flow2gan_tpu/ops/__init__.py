"""DSP ops. Import submodules (`ops.stft`, `ops.mel`, `ops.pallas`) directly;
function names like `stft` are intentionally not re-exported at this level to
avoid shadowing the submodules.
"""

from flow2gan_tpu.ops import mel, stft  # noqa: F401
from flow2gan_tpu.ops.mel import (  # noqa: F401
    LinearFilterSpectrogram,
    LogMelSpectrogram,
    MelSpectrogram,
    linear_fbanks,
    melscale_fbanks,
    spectrogram,
)
from flow2gan_tpu.ops.tokenizer import (  # noqa: F401
    MelKMeansTokenizer,
    kmeans_fit,
)
from flow2gan_tpu.ops.stft import (  # noqa: F401
    hann_window,
    num_frames,
    real_to_spec,
    spec_to_real,
    stft_lens,
)
