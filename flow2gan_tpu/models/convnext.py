"""ConvNeXt-1D building blocks and the per-branch STFT-domain model.

TPU-first re-design of /root/reference/flow2gan/models/modules.py:419-721:

- channels-last (B, T, C) layout everywhere: C rides the 128-lane dimension,
  pointwise convs become MXU matmuls, the depthwise k=7 conv is a cheap
  VPU op that XLA fuses with the surrounding elementwise work;
- time/cond conditioning is FiLM-style exactly as the reference
  (add cond projection, multiply by (1 + time projection));
- `AudioConvNeXt` runs waveform -> STFT -> decode -> iSTFT entirely inside
  one jittable function (the STFT/iSTFT are the XLA-native ops from
  flow2gan_tpu.ops.stft).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from flow2gan_tpu.models.norms import BiasNorm, ChannelScale, PReLU
from flow2gan_tpu.ops.stft import (
    istft,
    real_to_spec,
    spec_to_real,
    stft,
    stft_lens,
)
from flow2gan_tpu.utils import make_valid_mask

# trunc_normal(std=0.015) like the reference weight init (generator.py:122-127)
_KERNEL_INIT = nn.initializers.truncated_normal(stddev=0.015, lower=-2.0, upper=2.0)


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal embedding of flow time t: (B,) -> (B, dim).

    Reference modules.py:217-232 (sin block then cos block).
    """
    assert dim % 2 == 0
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    arg = scale * t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


class DepthwiseConv1d(nn.Module):
    """Depthwise k-tap conv with two lowerings, identical params to
    `nn.Conv(features=C, kernel_size=(k,), feature_group_count=C)` so
    checkpoints are interchangeable.

    impl="conv": jax.lax conv (XLA's convolution op).
    impl="stencil": unrolled shift-multiply-add over the k taps — pure
    elementwise work that XLA fuses into the consumer (e.g. the BiasNorm
    variance reduce that follows in ConvNeXtBlock), removing the standalone
    convolution op and its HBM round-trip. f32 accumulation either way.
    impl="auto": stencil on TPU backends for the inference path, conv
    elsewhere. Measured on a v5e chip: stencil is +3.5% for inference
    (fwd-only) but -38% for the jitted FM train step (3.0 -> 1.9 steps/s at
    global batch 256) — XLA's backward for 7 shifted multiplies is far worse
    than the conv op's transposed-conv gradient — so "auto" keys on `train`.
    """

    channels: int
    kernel_size: int = 7
    dtype: Optional[jnp.dtype] = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param(
            "kernel", _KERNEL_INIT, (k, 1, self.channels), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        impl = self.impl
        if impl == "auto":
            impl = (
                "stencil"
                if (jax.default_backend() == "tpu" and not train)
                else "conv"
            )
        if impl == "conv":
            dtype = self.dtype or x.dtype
            out = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel[:, 0, :][:, None, :].astype(dtype),
                window_strides=(1,),
                padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.channels,
            )
            return out + bias.astype(out.dtype)
        # stencil: out[t] = sum_j w[j] * x[t + j - k//2], zero-padded edges.
        # Mirror the TPU conv's bf16 semantics (inputs/weights rounded to the
        # compute dtype, products accumulated in f32) so the "auto" switch
        # between lowerings doesn't change numerics class under
        # compute_dtype='bfloat16'.
        dtype = self.dtype or x.dtype
        left = (k - 1) // 2
        right = k - 1 - left
        xp = (
            jnp.pad(x.astype(dtype), ((0, 0), (left, right), (0, 0)))
            .astype(jnp.float32)
        )
        T = x.shape[1]
        acc = bias[None, None, :].astype(jnp.float32)
        w = kernel[:, 0, :].astype(dtype).astype(jnp.float32)  # (k, C)
        out = acc + sum(
            xp[:, j : j + T, :] * w[j][None, None, :] for j in range(k)
        )
        return out.astype(dtype)


class ConvNeXtBlock(nn.Module):
    """depthwise k7 conv -> BiasNorm -> (+cond) -> (×(1+time)) -> MLP -> +res.

    Reference modules.py:419-495. Input (B, T, C).
    """

    channels: int
    hidden_channels: int
    kernel_size: int = 7
    use_cond: bool = False
    use_time: bool = False
    use_residual_scale: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)
    dwconv_impl: str = "conv"  # "conv" | "stencil" | "auto" (see DepthwiseConv1d)
    # When cond runs at a lower frame rate than x, project at the NATIVE rate
    # and nearest-repeat the projection: pointwise ops commute with repeat, so
    # this is bit-identical to projecting repeated rows but skips the
    # redundant FLOPs (4x on the hop-64 branch: ~8% of inference device time).
    cond_upsample_factor: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        time_embed: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        residual = x
        if mask is not None:
            x = x * mask.astype(x.dtype)
        x = DepthwiseConv1d(
            self.channels,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            impl=self.dwconv_impl,
            name="dwconv",
        )(x, train=train)
        x = BiasNorm(self.channels, name="norm")(x, train=train)
        if self.use_cond:
            assert cond is not None
            c = nn.Dense(
                self.channels, kernel_init=_KERNEL_INIT, dtype=self.dtype,
                name="cond_proj",
            )(cond)
            if self.cond_upsample_factor != 1:
                c = jnp.repeat(c, self.cond_upsample_factor, axis=1)
            x = x + c[:, : x.shape[1]]
        if self.use_time:
            assert time_embed is not None
            gain = nn.Dense(
                self.channels, kernel_init=_KERNEL_INIT, dtype=self.dtype,
                name="time_embed_proj",
            )(time_embed)
            x = x * (1.0 + gain)[:, None, :]
        x = nn.Dense(
            self.hidden_channels, kernel_init=_KERNEL_INIT, dtype=self.dtype,
            name="pwconv1",
        )(x)
        x = PReLU(self.hidden_channels, name="act")(x)
        x = nn.Dense(
            self.channels, kernel_init=_KERNEL_INIT, dtype=self.dtype,
            name="pwconv2",
        )(x)
        if self.use_residual_scale:
            residual = ChannelScale(self.channels, name="residual_scale")(
                residual, train=train
            )
        return x + residual


class CondEncoder(nn.Module):
    """ConvNeXt encoder over conditioning features (mels); computed once and
    shared by all branches. Reference modules.py:498-542. Input (B, T, cond_dim).
    """

    cond_dim: int = 100
    channels: int = 512
    hidden_factor: int = 3
    conv_kernel_size: int = 7
    num_layers: int = 4
    use_residual_scale: bool = True
    dtype: Optional[jnp.dtype] = None
    dwconv_impl: str = "conv"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None, train: bool = False
    ) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(
            self.channels,
            (3,),
            padding="SAME",
            kernel_init=_KERNEL_INIT,
            dtype=self.dtype,
            name="in_proj",
        )(x)
        x = BiasNorm(self.channels, name="in_norm")(x, train=train)
        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                channels=self.channels,
                hidden_channels=int(self.channels * self.hidden_factor),
                kernel_size=self.conv_kernel_size,
                use_residual_scale=self.use_residual_scale,
                dtype=self.dtype,
                dwconv_impl=self.dwconv_impl,
                name=f"blocks_{i}",
            )(x, mask=mask, train=train)
        return x


class ConvNeXtDecoder(nn.Module):
    """Per-branch trunk over packed Fourier coefficients.

    Reference modules.py:545-627. Input (B, T_f, in_channels).
    """

    in_channels: int
    out_channels: int
    channels: int = 512
    cond_channels: int = 512
    time_embed_channels: int = 512
    hidden_factor: int = 3
    conv_kernel_size: int = 7
    num_layers: int = 8
    use_residual_scale: bool = True
    use_t: bool = True
    dtype: Optional[jnp.dtype] = None
    dwconv_impl: str = "conv"
    cond_upsample_factor: int = 1  # cond arrives at 1/factor of x's frame rate

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        t: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.cond_upsample_factor != 1:
            # trim/zero-pad the NATIVE cond so repeat covers x's frames; the
            # padded tail then carries proj-chain(0), exactly what projecting
            # zero-padded repeated rows produced (AudioConvNeXt.upsample_cond)
            need = -(-x.shape[1] // self.cond_upsample_factor)  # ceil div
            cur = cond.shape[1]
            if need <= cur:
                cond = cond[:, :need]
            else:
                cond = jnp.pad(cond, ((0, 0), (0, need - cur), (0, 0)))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dense(
            self.channels, kernel_init=_KERNEL_INIT, dtype=self.dtype, name="in_proj"
        )(x)
        x = BiasNorm(self.channels, name="in_norm")(x, train=train)

        time_embed = None
        if self.use_t:
            assert t is not None
            emb = sinusoidal_pos_emb(t, self.time_embed_channels)
            hid = int(self.time_embed_channels * self.hidden_factor)
            emb = nn.Dense(
                hid, kernel_init=_KERNEL_INIT, dtype=self.dtype, name="time_mlp_0"
            )(emb)
            emb = nn.silu(emb)
            time_embed = nn.Dense(
                self.time_embed_channels, kernel_init=_KERNEL_INIT, dtype=self.dtype,
                name="time_mlp_2",
            )(emb)

        cond_hidden = int(self.cond_channels * self.hidden_factor)
        if self.dtype is not None:
            cond = cond.astype(self.dtype)
        cond = nn.Dense(
            cond_hidden, kernel_init=_KERNEL_INIT, dtype=self.dtype, name="cond_mlp_0"
        )(cond)
        cond = PReLU(cond_hidden, name="cond_mlp_1")(cond)
        cond = nn.Dense(
            self.cond_channels, kernel_init=_KERNEL_INIT, dtype=self.dtype,
            name="cond_mlp_2",
        )(cond)

        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                channels=self.channels,
                hidden_channels=int(self.channels * self.hidden_factor),
                kernel_size=self.conv_kernel_size,
                use_cond=True,
                use_time=self.use_t,
                use_residual_scale=self.use_residual_scale,
                dtype=self.dtype,
                dwconv_impl=self.dwconv_impl,
                cond_upsample_factor=self.cond_upsample_factor,
                name=f"blocks_{i}",
            )(x, cond=cond, time_embed=time_embed, mask=mask, train=train)

        x = nn.Dense(
            self.out_channels, kernel_init=_KERNEL_INIT, dtype=self.dtype,
            name="out_proj",
        )(x)
        return x.astype(jnp.float32)


class AudioConvNeXt(nn.Module):
    """One resolution branch: wav -> STFT -> ConvNeXt decode -> iSTFT -> wav.

    Reference modules.py:630-721. Input audio (B, L), cond (B, T_c, C_c).
    """

    n_fft: int = 512
    hop_length: int = 256
    cond_hop_length: int = 256
    channels: int = 768
    cond_channels: int = 512
    time_embed_channels: int = 512
    hidden_factor: int = 3
    conv_kernel_size: int = 7
    num_layers: int = 8
    use_residual_scale: bool = True
    use_t: bool = True
    dtype: Optional[jnp.dtype] = None
    # Pallas kernel switch: True / False / "auto" (= on when running on a
    # TPU backend and the (n_fft, hop) pair is 128-aligned; bitwise-safe XLA
    # fallback elsewhere). "auto" keeps every entry point — trainers, infer
    # CLIs, api.get_model, bench — on the same kernel config. Measured on a
    # v5e chip: XLA iSTFT 1,710 xRT vs Pallas 5,318 xRT (b16 1-step 24 kHz).
    # A fused Pallas STFT was also tried and DELETED: no longer compiled on
    # the current libtpu toolchain (Mosaic error) and the XLA path is not a
    # bottleneck.
    use_pallas_istft: Any = "auto"
    # "auto" = stencil on TPU: the unrolled shift-multiply-add fuses into the
    # following BiasNorm reduce; measured +3.5% end-to-end vs the conv op
    # (5,455 vs 5,262 xRT, bf16 b16 1-step, best-of-3 back-to-back).
    dwconv_impl: str = "auto"

    def setup(self):
        assert self.cond_hop_length % self.hop_length == 0, (
            "cond_hop_length must be an integer multiple of hop_length"
        )
        real_fft_channels = self.n_fft + 2
        self.cond_upsample_factor = self.cond_hop_length // self.hop_length
        self.decoder = ConvNeXtDecoder(
            in_channels=real_fft_channels,
            out_channels=real_fft_channels,
            channels=self.channels,
            cond_channels=self.cond_channels,
            time_embed_channels=self.time_embed_channels,
            hidden_factor=self.hidden_factor,
            conv_kernel_size=self.conv_kernel_size,
            num_layers=self.num_layers,
            use_residual_scale=self.use_residual_scale,
            use_t=self.use_t,
            dtype=self.dtype,
            dwconv_impl=self.dwconv_impl,
            cond_upsample_factor=self.cond_upsample_factor,
        )

    def upsample_cond(self, cond: jnp.ndarray, fft_frames: int) -> jnp.ndarray:
        """Nearest-repeat cond to the branch frame rate, then truncate/pad.

        Reference modules.py:668-680. cond: (B, T_c, C) -> (B, fft_frames, C).
        """
        factor = self.cond_hop_length // self.hop_length
        if factor != 1:
            cond = jnp.repeat(cond, factor, axis=1)
        cur = cond.shape[1]
        if fft_frames <= cur:
            cond = cond[:, :fft_frames]
        else:
            cond = jnp.pad(cond, ((0, 0), (0, fft_frames - cur), (0, 0)))
        return cond

    def _pallas_enabled(self, flag, supported: bool) -> bool:
        from flow2gan_tpu.ops import pallas_istft

        if pallas_istft.is_disabled():
            # traced inside loop control flow (scanned Euler rollout), where
            # the custom call's buffers would be stack-allocated in scoped
            # VMEM and can exceed the 16 MB limit — see pallas_istft.disabled
            return False
        if flag == "auto":
            flag = jax.default_backend() == "tpu"
        return bool(flag) and supported

    def __call__(
        self,
        audio: jnp.ndarray,
        cond: jnp.ndarray,
        t: Optional[jnp.ndarray] = None,
        audio_lens: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        length = audio.shape[-1]
        spec = stft(audio, self.n_fft, self.hop_length)  # (B, T_f, F) complex
        x = spec_to_real(spec)  # (B, T_f, n_fft + 2)
        fft_frames = x.shape[1]

        if self.cond_upsample_factor == 1:
            cond = self.upsample_cond(cond, fft_frames)
        # else: decoder projects at the native rate and repeats (bit-identical)

        mask = None
        if audio_lens is not None:
            fft_lens = stft_lens(audio_lens, self.hop_length)
            mask = make_valid_mask(fft_lens, fft_frames)[..., None]  # (B, T_f, 1)

        x = self.decoder(x, cond=cond, t=t, mask=mask, train=train)
        if mask is not None:
            x = x * mask

        out_spec = real_to_spec(x)
        from flow2gan_tpu.ops.pallas_istft import istft_pallas, supported

        if self._pallas_enabled(
            self.use_pallas_istft, supported(self.n_fft, self.hop_length)
        ):
            return istft_pallas(
                out_spec, self.n_fft, self.hop_length, length=length
            )
        audio_out = istft(out_spec, self.n_fft, self.hop_length, length=length)
        return audio_out
