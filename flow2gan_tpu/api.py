"""Public model API: `get_model` mirrors the reference
/root/reference/flow2gan/__init__.py:29-48 (named config + HuggingFace or
local checkpoint), returning a ready-to-run jitted vocoder.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flow2gan_tpu.models import (
    HF_MODEL_NAMES,
    HF_REPO,
    build_generator,
    generator_config_for_hf_model,
    get_generator_config,
)
from flow2gan_tpu.ops.mel import LogMelSpectrogram
from flow2gan_tpu.utils import AttributeDict


@dataclasses.dataclass
class VocoderModel:
    """A generator + params + conditioning frontend, with jitted inference.

    `infer(cond)` takes (B, n_mels, frames) log-mels — or (B, frames) int32
    tokens for token_* configs — -> (B, frames * hop) waveforms;
    `mel(audio)` takes (B, L) -> (B, n_mels, frames) log-mels;
    `tokens(audio)` takes (B, L) -> (B, frames) int32 (token models only);
    `reconstruct(audio)` = infer(<frontend>(audio)).
    """

    module: object  # MelAudioGenerator / TokenAudioGenerator (flax module)
    variables: dict
    config: AttributeDict
    n_timesteps: int = 1
    tokenizer: Optional[object] = None  # MelKMeansTokenizer for token_* configs

    def __post_init__(self):
        self._mel_fn = LogMelSpectrogram(
            sampling_rate=self.config.sampling_rate,
            n_fft=self.config.mel_n_fft,
            hop_length=self.config.mel_hop_length,
            n_mels=self.config.n_mels,
        )
        self._infer_jit = jax.jit(
            self._infer_impl, static_argnames=("n_timesteps", "clamp_pred")
        )
        self._mel_jit = jax.jit(self._mel_fn)
        self._tok_jit = jax.jit(self.tokenizer) if self.tokenizer else None

    def _infer_impl(self, variables, cond, seed, n_timesteps, clamp_pred):
        # PRNG key built inside jit (host-side key construction/folding costs
        # ~0.3 ms of dispatch overhead per call)
        return self.module.apply(
            variables,
            cond,
            n_timesteps=n_timesteps,
            clamp_pred=clamp_pred,
            method="infer",
            rngs={"noise": jax.random.PRNGKey(seed)},
        )

    def mel(self, audio) -> jnp.ndarray:
        return self._mel_jit(jnp.asarray(audio))

    def tokens(self, audio) -> jnp.ndarray:
        """(B, L) audio -> (B, frames) int32 pseudo-codec tokens."""
        if self._tok_jit is None:
            raise ValueError(
                "this model has no tokenizer; pass tokenizer=<codebook.npz> "
                "to get_model for token_* configs"
            )
        return self._tok_jit(jnp.asarray(audio))

    def infer(
        self,
        cond,
        n_timesteps: Optional[int] = None,
        clamp_pred: bool = True,
        seed: int = 0,
    ) -> jnp.ndarray:
        n = n_timesteps if n_timesteps is not None else self.n_timesteps
        return self._infer_jit(
            self.variables,
            jnp.asarray(cond),
            jnp.int32(seed),
            n,
            clamp_pred,
        )

    def reconstruct(self, audio, n_timesteps: Optional[int] = None) -> jnp.ndarray:
        if self.config.get("conditioning", "mel") == "tokens":
            return self.infer(self.tokens(audio), n_timesteps=n_timesteps)
        return self.infer(self.mel(audio), n_timesteps=n_timesteps)


def _download_from_hf(hf_model_name: str) -> str:
    from huggingface_hub import hf_hub_download

    return hf_hub_download(HF_REPO, f"{hf_model_name}.pt")


def load_params(checkpoint: str, module, example_cond) -> dict:
    """Load params from a .pt (torch, converted) or native flax msgpack file.

    `example_cond`: template conditioning array (f32 mels or int32 tokens)."""
    path = str(checkpoint)
    rng = jax.random.PRNGKey(0)
    cond = example_cond
    template = module.init(
        {"params": rng, "noise": rng},
        cond,
        n_timesteps=1,
        method="infer",
    )
    if path.endswith(".pt"):
        from flow2gan_tpu.compat.torch_convert import (
            convert_torch_state_dict,
            load_torch_file,
            strip_prefixes,
        )

        sd = load_torch_file(path)
        sd = strip_prefixes(
            sd, unwrap_generator=any(k.startswith("generator.") for k in sd)
        )
        params, missing, _ = convert_torch_state_dict(sd, template["params"])
        if missing:
            logging.warning("checkpoint %s left %d params at init", path, len(missing))
        return {"params": params}
    else:
        from flow2gan_tpu.training.checkpoint import load_checkpoint

        state = load_checkpoint(path)
        params = state["model"] if "model" in state else state
        # restore against the template structure
        import flax

        params = flax.serialization.from_state_dict(template["params"], params)
        return {"params": params}


def get_model(
    model_name: Optional[str] = None,
    hf_model_name: Optional[str] = None,
    checkpoint: Optional[str] = None,
    tokenizer: Optional[str] = None,
) -> VocoderModel:
    """Build a vocoder from a named config, loading HF or local weights.

    Mirrors reference __init__.py:29-48. Exactly one of `hf_model_name` /
    `checkpoint` may be given; with neither, returns randomly-initialized
    params (useful for tests). `tokenizer`: codebook .npz path (or a
    MelKMeansTokenizer) enabling `tokens`/`reconstruct` on token_* configs.
    """
    n_timesteps = 1
    if hf_model_name is not None:
        if hf_model_name not in HF_MODEL_NAMES:
            raise ValueError(
                f"Unknown HF model {hf_model_name}; available: {sorted(HF_MODEL_NAMES)}"
            )
        n_timesteps = HF_MODEL_NAMES[hf_model_name]
        if model_name is None:
            model_name = generator_config_for_hf_model(hf_model_name)
    if model_name is None:
        model_name = "mel_24k_base"
    cfg = get_generator_config(model_name)
    # Pallas iSTFT defaults to "auto" (on for TPU backends, 128-aligned hops)
    module = build_generator(cfg)

    if hf_model_name is not None and checkpoint is None:
        checkpoint = _download_from_hf(hf_model_name)

    is_token = cfg.get("conditioning", "mel") == "tokens"
    example_cond = (
        jnp.zeros((1, 16), jnp.int32)
        if is_token
        else jnp.zeros((1, cfg.n_mels, 16), jnp.float32)
    )
    if checkpoint is not None:
        if not Path(checkpoint).exists():
            raise FileNotFoundError(checkpoint)
        variables = load_params(checkpoint, module, example_cond)
    else:
        rng = jax.random.PRNGKey(0)
        variables = module.init(
            {"params": rng, "noise": rng},
            example_cond,
            n_timesteps=1,
            method="infer",
        )

    tok = None
    if tokenizer is not None:
        from flow2gan_tpu.ops.tokenizer import MelKMeansTokenizer

        tok = (
            tokenizer
            if isinstance(tokenizer, MelKMeansTokenizer)
            else MelKMeansTokenizer.from_file(tokenizer, expect_config=cfg)
        )

    return VocoderModel(
        module=module, variables=variables, config=cfg,
        n_timesteps=n_timesteps, tokenizer=tok,
    )
