"""Flow-Matching audio generators (endpoint / x1-prediction formulation).

Re-design of /root/reference/flow2gan/models/generator.py for JAX/TPU:

- the whole k-step Euler solve is one jittable function (static k, unrolled —
  exactly the graph the GAN fine-tuning stage differentiates through);
- stochastic pieces (t ~ U(0,1), x0 noise, mel-noise augmentation, branch
  dropout, param-limit gates) are driven by named flax RNG streams
  ('noise', 'dropout', 'gate');
- conditioning enters as (B, cond_dim, frames) at the public boundary
  (reference layout) and is transposed once to channels-last internally.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from flow2gan_tpu.models.convnext import AudioConvNeXt, CondEncoder
from flow2gan_tpu.ops.mel import linear_fbanks
from flow2gan_tpu.ops.stft import stft_lens
from flow2gan_tpu.ops.mel import spectrogram
from flow2gan_tpu.utils import make_valid_mask


class BaseAudioGenerator(nn.Module):
    """Multi-branch ("multi-resolution") endpoint-FM generator.

    Reference generator.py:30-271.
    """

    sampling_rate: int = 24000
    n_ffts: Tuple[int, ...] = (512, 256, 128)
    hop_lengths: Tuple[int, ...] = (256, 128, 64)
    channels: Tuple[int, ...] = (768, 512, 384)
    time_embed_channels: int = 512
    hidden_factor: int = 3
    conv_kernel_sizes: Tuple[int, ...] = (7, 7, 7)
    num_layers: Tuple[int, ...] = (8, 8, 8)
    use_cond_encoder: bool = True
    cond_dim: int = 100
    cond_hop_length: int = 256
    cond_enc_channels: int = 512
    cond_enc_hidden_factor: int = 3
    cond_enc_conv_kernel_size: int = 7
    cond_enc_num_layers: int = 4
    use_residual_scale: bool = True
    init_noise_scale: float = 0.1
    pred_x1: bool = True
    branch_reduction: str = "mean"
    spec_scaling_loss: bool = True
    loss_n_filters: int = 256
    loss_n_fft: int = 1024
    loss_hop_length: int = 256
    loss_power: float = 0.5
    loss_eps: float = 1e-7
    loss_scale_min: float = 1e-2
    loss_scale_max: float = 1e2
    branch_dropout: float = 0.05
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'; params stay f32
    use_pallas_istft: Any = "auto"  # fused iSTFT kernel (see AudioConvNeXt)
    dwconv_impl: str = "auto"  # TPU: stencil for inference (+3.5%), conv when training (stencil bwd is -38%)

    @property
    def num_branches(self) -> int:
        return len(self.n_ffts)

    def setup(self):
        assert len(self.hop_lengths) == self.num_branches
        assert len(self.channels) == self.num_branches
        assert len(self.conv_kernel_sizes) == self.num_branches
        assert len(self.num_layers) == self.num_branches
        assert self.branch_reduction in ("mean", "sum")

        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if self.use_cond_encoder:
            self.cond_encoder = CondEncoder(
                cond_dim=self.cond_dim,
                channels=self.cond_enc_channels,
                hidden_factor=self.cond_enc_hidden_factor,
                conv_kernel_size=self.cond_enc_conv_kernel_size,
                num_layers=self.cond_enc_num_layers,
                use_residual_scale=self.use_residual_scale,
                dtype=dtype,
                dwconv_impl=self.dwconv_impl,
            )

        self.estimators = [
            AudioConvNeXt(
                n_fft=self.n_ffts[i],
                hop_length=self.hop_lengths[i],
                cond_hop_length=self.cond_hop_length,
                channels=self.channels[i],
                cond_channels=self.cond_enc_channels
                if self.use_cond_encoder
                else self.cond_dim,
                time_embed_channels=self.time_embed_channels,
                hidden_factor=self.hidden_factor,
                conv_kernel_size=self.conv_kernel_sizes[i],
                num_layers=self.num_layers[i],
                use_residual_scale=self.use_residual_scale,
                dtype=dtype,
                use_pallas_istft=self.use_pallas_istft,
                dwconv_impl=self.dwconv_impl,
                name=f"estimators_{i}",
            )
            for i in range(self.num_branches)
        ]

    # ----------------------------------------------------------------- core

    def process_model(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        t: Optional[jnp.ndarray] = None,
        audio_lens: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Run all branches and fuse. Reference generator.py:129-170.

        x: (B, L) noisy waveform; cond: (B, T_c, C) channels-last, already
        encoded; t: (B,) flow time.
        """
        branch_outputs = jnp.stack(
            [
                est(audio=x, cond=cond, t=t, audio_lens=audio_lens, train=train)
                for est in self.estimators
            ],
            axis=1,
        )  # (B, num_branches, L)

        if train and self.branch_dropout > 0.0 and self.num_branches > 1:
            b = branch_outputs.shape[0]
            nb = self.num_branches
            key = self.make_rng("dropout")
            k1, k2 = jax.random.split(key)
            branch_idx = jax.random.randint(k1, (b,), 0, nb)
            mask = jnp.ones((b, nb), branch_outputs.dtype)
            mask = mask.at[jnp.arange(b), branch_idx].set(0.0)
            mask = mask * (nb / (nb - 1))  # rescale so expectation is unchanged
            do_drop = jax.random.uniform(k2, (b, 1)) < self.branch_dropout
            weight = jnp.where(do_drop, mask, jnp.ones_like(mask))
            branch_outputs = branch_outputs * weight[..., None]

        if self.branch_reduction == "mean":
            return branch_outputs.mean(axis=1)
        return branch_outputs.sum(axis=1)

    def compute_loss(
        self,
        pred: jnp.ndarray,
        ref: jnp.ndarray,
        audio_lens: jnp.ndarray,
        gt_audio: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Masked MSE, optionally spectral-energy-scaled.

        Reference generator.py:172-200: the squared error's linear-filterbank
        power spectrum is weighted by (gt power + eps)^-0.5 clamped to
        [1e-2, 1e2], up-weighting quiet spectral regions.
        """
        err = pred - ref  # (B, L)

        if not self.spec_scaling_loss:
            mask = make_valid_mask(audio_lens, err.shape[-1])
            loss = (err**2 * mask).sum() / mask.sum()
            return loss

        assert gt_audio is not None
        # time-major power spectrograms (B, T_s, F)
        gt_spec = self._loss_spec(gt_audio)
        err_spec = self._loss_spec(err)
        spec_lens = stft_lens(audio_lens, self.loss_hop_length)
        mask = make_valid_mask(spec_lens, err_spec.shape[1])[..., None]
        spec_scale = jnp.clip(
            (gt_spec + self.loss_eps) ** -self.loss_power,
            min=self.loss_scale_min,
            max=self.loss_scale_max,
        )
        loss = err_spec * spec_scale
        n_filters = err_spec.shape[-1]
        return (loss * mask).sum() / (mask.sum() * n_filters)

    def _loss_spec(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Linear-filterbank power spectrogram, time-major (B, T_s, n_filter)."""
        mag = spectrogram(audio, self.loss_n_fft, self.loss_hop_length, power=2.0)
        fb = jnp.asarray(
            linear_fbanks(
                n_freqs=self.loss_n_fft // 2 + 1,
                f_min=0.0,
                f_max=float(self.sampling_rate // 2),
                n_filter=self.loss_n_filters,
                sample_rate=self.sampling_rate,
            )
        )
        return mag @ fb

    def flow_matching_loss(
        self,
        x0: jnp.ndarray,
        x1: jnp.ndarray,
        cond: jnp.ndarray,
        audio_lens: jnp.ndarray,
        train: bool = True,
    ) -> jnp.ndarray:
        """FM training loss with endpoint target. Reference generator.py:202-234."""
        key = self.make_rng("noise")
        t = jax.random.uniform(key, (x0.shape[0],), x0.dtype)
        x = (1.0 - t[:, None]) * x0 + t[:, None] * x1
        ref = x1 if self.pred_x1 else (x1 - x0)
        pred = self.process_model(
            x=x, cond=cond, t=t, audio_lens=audio_lens, train=train
        )
        return self.compute_loss(
            pred=pred, ref=ref, audio_lens=audio_lens, gt_audio=x1
        )

    def solve(
        self,
        noise: jnp.ndarray,
        cond: jnp.ndarray,
        audio_lens: Optional[jnp.ndarray] = None,
        n_timesteps: int = 1,
        clamp_pred: bool = False,
        train: bool = False,
        scan_solve: bool = False,
        remat_scan: bool = False,
    ) -> jnp.ndarray:
        """Fixed-grid Euler ODE solve (endpoint form). Reference generator.py:236-271.

        `scan_solve=False` unrolls the loop (n_timesteps is 1/2/4) — best for
        forward-only inference where XLA specializes each step's constants.
        `scan_solve=True` rolls the steps into one `nn.scan`, so the traced
        program holds ONE copy of the model regardless of n_timesteps — this
        is what the GAN G-step differentiates through at n>1: the unrolled
        2-step backward graph is a ~30 MB MLIR program that can OOM the AOT
        compiler, while the scanned one stays near the 1-step size. For
        train=False both paths are step-for-step the same ops (parity-tested);
        for train=True the per-step RNG folds differ (both are valid draws).

        `remat_scan=True` additionally rematerializes the scan BODY
        (nn.remat): backward recomputes each Euler step's forward from its
        carry, so differentiated-rollout residual memory is ~one step
        regardless of n_timesteps (the 44.1 kHz 4-step G step at batch 16
        stores 16.1 GB of residuals unremattered — over the 15.75 GB v5e HBM;
        the reference hits the same wall as a deep autograd graph,
        SURVEY.md §7). Identical numerics, ~1 extra forward of FLOPs.
        """
        dt = 1.0 / n_timesteps
        if not scan_solve or n_timesteps == 1:
            x = noise
            for step in range(n_timesteps):
                t = step * dt
                t_vec = jnp.full((noise.shape[0],), t, noise.dtype)
                pred = self.process_model(
                    x=x, cond=cond, t=t_vec, audio_lens=audio_lens, train=train
                )
                vt = (pred - x) / (1.0 - t) if self.pred_x1 else pred
                x = x + vt * dt
            if clamp_pred:
                x = jnp.clip(x, -1.0, 1.0)
            return x

        ts = jnp.arange(n_timesteps, dtype=noise.dtype) * dt

        def body(mdl, x, t):
            t_vec = jnp.full((x.shape[0],), t, x.dtype)
            pred = mdl.process_model(
                x=x, cond=cond, t=t_vec, audio_lens=audio_lens, train=train
            )
            vt = (pred - x) / (1.0 - t) if mdl.pred_x1 else pred
            return x + vt * dt, None

        if remat_scan:
            # prevent_cse is safe (and cheaper) inside scan/while bodies
            body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "noise": True, "gate": True, "dropout": True},
            in_axes=0,
            out_axes=0,
        )
        # Inside the scan's while body the Pallas iSTFT's operands/results
        # are stack-allocated in scoped VMEM by XLA:TPU and can exceed the
        # 16 MB limit (observed at 44.1 kHz, batch 16); trace the body with
        # the kernel disabled so it uses the XLA iSTFT (same numerics).
        from flow2gan_tpu.ops import pallas_istft

        with pallas_istft.disabled():
            x, _ = scan(self, noise, ts)
        if clamp_pred:
            x = jnp.clip(x, -1.0, 1.0)
        return x


class MelAudioGenerator(BaseAudioGenerator):
    """Mel-conditioned generator. Reference generator.py:274-366.

    Public layout: cond is (B, n_mels, frames) like the reference; audio is
    (B, L).
    """

    n_mels: int = 100
    mel_n_fft: int = 1024
    mel_hop_length: int = 256
    max_add_noise_scale: float = 0.0

    def _encode_cond(self, cond: jnp.ndarray, train: bool) -> jnp.ndarray:
        cond = cond.swapaxes(-1, -2)  # -> (B, frames, n_mels)
        if train and self.max_add_noise_scale > 0.0:
            key = self.make_rng("noise")
            k1, k2 = jax.random.split(key)
            scale = (
                jax.random.uniform(k1, (cond.shape[0], 1, 1), cond.dtype)
                * self.max_add_noise_scale
            )
            cond = cond + jax.random.normal(k2, cond.shape, cond.dtype) * scale
        if self.use_cond_encoder:
            cond = self.cond_encoder(cond, train=train)
        return cond

    def __call__(
        self,
        cond: jnp.ndarray,
        audio: jnp.ndarray,
        audio_lens: jnp.ndarray,
        train: bool = True,
    ) -> jnp.ndarray:
        """FM loss. cond: (B, n_mels, frames); audio: (B, L)."""
        cond = self._encode_cond(cond, train)
        key = self.make_rng("noise")
        noise = jax.random.normal(key, audio.shape, audio.dtype) * self.init_noise_scale
        return self.flow_matching_loss(
            x0=noise, x1=audio, cond=cond, audio_lens=audio_lens, train=train
        )

    def infer(
        self,
        cond: jnp.ndarray,
        audio_lens: Optional[jnp.ndarray] = None,
        n_timesteps: int = 1,
        clamp_pred: bool = False,
        train: bool = False,
        scan_solve: bool = False,
        remat_scan: bool = False,
    ) -> jnp.ndarray:
        """Euler-solve waveforms from mels. cond: (B, n_mels, frames) -> (B, L).

        L = frames * mel_hop_length (static; audio_lens only masks).
        """
        length = cond.shape[-1] * self.mel_hop_length
        cond_enc = self._encode_cond(cond, train)
        key = self.make_rng("noise")
        noise = (
            jax.random.normal(key, (cond.shape[0], length), jnp.float32)
            * self.init_noise_scale
        )
        return self.solve(
            noise=noise,
            cond=cond_enc,
            audio_lens=audio_lens,
            n_timesteps=n_timesteps,
            clamp_pred=clamp_pred,
            train=train,
            scan_solve=scan_solve,
            remat_scan=remat_scan,
        )

    def infer_from_noise(
        self,
        noise: jnp.ndarray,
        cond: jnp.ndarray,
        audio_lens: Optional[jnp.ndarray] = None,
        n_timesteps: int = 1,
        clamp_pred: bool = False,
        train: bool = False,
        scan_solve: bool = False,
        remat_scan: bool = False,
    ) -> jnp.ndarray:
        """Deterministic variant of `infer` with caller-provided x0 noise —
        used by parity tests and seeded generation."""
        cond_enc = self._encode_cond(cond, train)
        return self.solve(
            noise=noise,
            cond=cond_enc,
            audio_lens=audio_lens,
            n_timesteps=n_timesteps,
            clamp_pred=clamp_pred,
            train=train,
            scan_solve=scan_solve,
            remat_scan=remat_scan,
        )


class TokenAudioGenerator(BaseAudioGenerator):
    """Discrete-token-conditioned generator: an embedding table feeds the
    cond encoder instead of mels (capability extension; the reference's
    CondEncoder docstring names "codec embeddings" as intended conditioning,
    modules.py:499).
    """

    vocab_size: int = 1024
    token_hop_length: int = 256
    max_add_noise_scale: float = 0.0

    def setup(self):
        super().setup()
        self.token_embed = nn.Embed(
            self.vocab_size,
            self.cond_dim,
            embedding_init=nn.initializers.normal(stddev=0.02),
        )

    def _encode_cond(self, tokens: jnp.ndarray, train: bool) -> jnp.ndarray:
        cond = self.token_embed(tokens)  # (B, frames, cond_dim)
        if self.use_cond_encoder:
            cond = self.cond_encoder(cond, train=train)
        return cond

    def __call__(
        self,
        tokens: jnp.ndarray,
        audio: jnp.ndarray,
        audio_lens: jnp.ndarray,
        train: bool = True,
    ) -> jnp.ndarray:
        cond = self._encode_cond(tokens, train)
        key = self.make_rng("noise")
        noise = jax.random.normal(key, audio.shape, audio.dtype) * self.init_noise_scale
        return self.flow_matching_loss(
            x0=noise, x1=audio, cond=cond, audio_lens=audio_lens, train=train
        )

    def infer(
        self,
        tokens: jnp.ndarray,
        audio_lens: Optional[jnp.ndarray] = None,
        n_timesteps: int = 1,
        clamp_pred: bool = False,
        train: bool = False,
        scan_solve: bool = False,
        remat_scan: bool = False,
    ) -> jnp.ndarray:
        length = tokens.shape[-1] * self.token_hop_length
        cond = self._encode_cond(tokens, train)
        key = self.make_rng("noise")
        noise = (
            jax.random.normal(key, (tokens.shape[0], length), jnp.float32)
            * self.init_noise_scale
        )
        return self.solve(
            noise=noise,
            cond=cond,
            audio_lens=audio_lens,
            n_timesteps=n_timesteps,
            clamp_pred=clamp_pred,
            train=train,
            scan_solve=scan_solve,
            remat_scan=remat_scan,
        )
