from flow2gan_tpu.models.config import (  # noqa: F401
    HF_MODEL_NAMES,
    HF_REPO,
    generator_config_for_hf_model,
    get_gan_config,
    get_generator_config,
)
from flow2gan_tpu.models.convnext import (  # noqa: F401
    AudioConvNeXt,
    CondEncoder,
    ConvNeXtBlock,
    ConvNeXtDecoder,
    sinusoidal_pos_emb,
)
from flow2gan_tpu.models.generator import (  # noqa: F401
    BaseAudioGenerator,
    MelAudioGenerator,
    TokenAudioGenerator,
)
from flow2gan_tpu.models.discriminators import (  # noqa: F401
    Discriminators,
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from flow2gan_tpu.models.norms import (  # noqa: F401
    BiasNorm,
    ChannelScale,
    PReLU,
    limit_param_value,
)


def build_generator(config) -> "BaseAudioGenerator":
    """Construct a generator from a named config dict/AttributeDict.

    `conditioning: "tokens"` builds a TokenAudioGenerator (discrete-token
    conditioning via the k-means pseudo-codec, `ops/tokenizer.py`); the
    default builds the mel-conditioned MelAudioGenerator. The mel_* keys of a
    token config describe its tokenizer frontend and are dropped here."""
    cfg = dict(config)
    cfg.pop("cond_dim", None)
    conditioning = cfg.pop("conditioning", "mel")
    n_mels = cfg.pop("n_mels")
    mel_hop_length = cfg.pop("mel_hop_length")
    if conditioning == "tokens":
        cfg.pop("mel_n_fft", None)
        return TokenAudioGenerator(
            cond_dim=cfg.pop("cond_embed_dim"),
            cond_hop_length=mel_hop_length,
            vocab_size=cfg.pop("vocab_size"),
            token_hop_length=mel_hop_length,
            **cfg,
        )
    if conditioning != "mel":
        raise ValueError(f"unknown conditioning: {conditioning!r}")
    return MelAudioGenerator(
        cond_dim=n_mels,
        cond_hop_length=mel_hop_length,
        n_mels=n_mels,
        mel_hop_length=mel_hop_length,
        **cfg,
    )
