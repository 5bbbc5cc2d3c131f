"""flow2gan_tpu — a TPU-native (JAX/XLA/Pallas) few-step neural vocoder framework.

Re-implements the full capability surface of k2-fsa/Flow2GAN (flow-matching
pretraining + GAN fine-tuning of a multi-resolution iSTFT generator) with a
TPU-first design: functional flax models, jitted Euler sampling, shard_map
data-parallel training over a jax.sharding.Mesh, and XLA/Pallas DSP kernels.

Public API mirrors the reference `flow2gan/__init__.py:29-48`:

    from flow2gan_tpu import get_model
    model = get_model("mel_24k_base", checkpoint="/path/ckpt.pt")
    mel = model.mel(audio)    # (B, L) waveform -> (B, n_mels, frames) log-mel
    audio = model.infer(mel)  # jitted mel -> (B, frames * hop) waveform
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy import: keep `import flow2gan_tpu` light (ops-only users shouldn't
    # pay for model/optimizer imports)
    if name == "get_model":
        from flow2gan_tpu.api import get_model

        return get_model
    if name == "VocoderModel":
        from flow2gan_tpu.api import VocoderModel

        return VocoderModel
    raise AttributeError(f"module 'flow2gan_tpu' has no attribute '{name}'")
