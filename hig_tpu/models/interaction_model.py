"""Combined conditioning + denoiser module with one parameter tree.

The reference's MotionInteractionTransformer owns CLIP, the learnable text
transformer, and the motion denoiser in one nn.Module
(interaction_transformer.py:397-616); this is the equivalent composite so a
single checkpoint carries everything. Text conditioning comes in three
flavors behind one interface:

  * caption tokens → frozen CLIP tower → learnable suffix  (default)
  * precomputed tower features → learnable suffix          (train fast path)
  * caption class id → learned embedding table             (cap_id / PIT)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from hig_tpu.config import ExperimentConfig
from hig_tpu.models.denoiser import InteractionDenoiser
from hig_tpu.models.text_encoder import ClassConditioner, ClipTextConfig, TextEncoder


class InteractionModel(nn.Module):
    """Two-actor denoiser + its text conditioning stack."""

    input_feats: int = 263
    num_frames: int = 196
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    text_latent_dim: int = 256
    text_ff_size: int = 2048
    text_num_heads: int = 4
    num_text_layers: int = 4
    dropout: float = 0.0
    efficient: bool = True
    interaction: bool = True
    cap_id: bool = False
    num_captions: int = 43
    clip_config: ClipTextConfig = ClipTextConfig()
    use_pallas: bool = False
    fused_blocks: bool = False
    causal: bool = False
    single_transformer: bool = False
    fast_ln: bool = False
    rms_norm: bool = False
    # classifier-free guidance (absent in the reference): > 0 creates the
    # learned null-conditioning params and enables caption dropout in the
    # train loss; sampling can then blend eps_uncond + w·(eps_cond −
    # eps_uncond) (make_sampler's guidance_scale). Kept at 0.0 by default so
    # the parameter tree of existing checkpoints is unchanged.
    cond_drop_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.latent_dim * 4

    def setup(self):
        if self.cap_id:
            self.text = ClassConditioner(
                num_captions=self.num_captions,
                text_latent_dim=self.text_latent_dim,
                time_embed_dim=self.time_embed_dim,
                dtype=self.dtype,
            )
        else:
            self.text = TextEncoder(
                clip_config=self.clip_config,
                text_latent_dim=self.text_latent_dim,
                text_ff_size=self.text_ff_size,
                text_num_heads=self.text_num_heads,
                num_text_layers=self.num_text_layers,
                time_embed_dim=self.time_embed_dim,
                dropout=self.dropout,
                dtype=self.dtype,
            )
        self.denoiser = InteractionDenoiser(
            input_feats=self.input_feats,
            num_frames=self.num_frames,
            latent_dim=self.latent_dim,
            ff_size=self.ff_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            text_latent_dim=self.text_latent_dim,
            dropout=self.dropout,
            efficient=self.efficient,
            interaction=self.interaction,
            use_pallas=self.use_pallas,
            fused_blocks=self.fused_blocks,
            causal=self.causal,
            single_transformer=self.single_transformer,
            fast_ln=self.fast_ln,
            rms_norm=self.rms_norm,
            dtype=self.dtype,
        )
        if self.cond_drop_prob > 0.0:
            self.null_xf_proj = self.param(
                "null_xf_proj", nn.initializers.zeros, (self.time_embed_dim,)
            )
            self.null_xf_token = self.param(
                "null_xf_token", nn.initializers.zeros, (self.text_latent_dim,)
            )

    # --- text conditioning -------------------------------------------------

    def encode_text(self, tokens_or_ids: jax.Array, deterministic: bool = True):
        """(B, 2, 77) tokens or (B, 2) cap ids → ((B,2,E), (B,2,L,Dt))."""
        B, A = tokens_or_ids.shape[:2]
        flat = tokens_or_ids.reshape((B * A,) + tokens_or_ids.shape[2:])
        if self.cap_id:
            xf_proj, xf_out = self.text(flat)
        else:
            xf_proj, xf_out = self.text(flat, deterministic)
        return (
            xf_proj.reshape(B, A, -1),
            xf_out.reshape((B, A) + xf_out.shape[1:]),
        )

    def clip_tower(self, tokens: jax.Array) -> jax.Array:
        """(N, 77) → frozen tower features (N, 77, width); cacheable."""
        return self.text.tower(tokens)

    def encode_text_from_tower(
        self, tower_out: jax.Array, tokens: jax.Array, deterministic: bool = True
    ):
        """(B, 2, 77, W) cached features + (B, 2, 77) tokens → conditioning."""
        B, A = tokens.shape[:2]
        xf_proj, xf_out = self.text.from_tower(
            tower_out.reshape((B * A,) + tower_out.shape[2:]),
            tokens.reshape(B * A, -1),
            deterministic,
        )
        return (
            xf_proj.reshape(B, A, -1),
            xf_out.reshape((B, A) + xf_out.shape[1:]),
        )

    def null_conditioning(self, B: int, L: int = 1):
        """The learned unconditional ('null caption') state for classifier-
        free guidance: ((B, 2, E) pooled, (B, 2, L, Dt) token state). L is a
        free choice — the efficient cross-attention softmax over L identical
        tokens reduces to the single-token K^T V exactly, so L=1 is the
        cheap default. Only exists when ``cond_drop_prob > 0``."""
        proj = jnp.broadcast_to(
            self.null_xf_proj.astype(self.dtype), (B, 2, self.time_embed_dim)
        )
        out = jnp.broadcast_to(
            self.null_xf_token.astype(self.dtype),
            (B, 2, L, self.text_latent_dim),
        )
        return proj, out

    # --- denoising ---------------------------------------------------------

    def text_kv(self, xf_out: jax.Array) -> tuple:
        """Per-layer loop-invariant text cross-attention state (hoist this
        out of the sampling scan — the text tokens never change)."""
        return self.denoiser.text_kv(xf_out)

    def denoise(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        lengths: jax.Array,
        xf_proj: jax.Array,
        xf_out: jax.Array | None,
        deterministic: bool = True,
        text_kv: tuple | None = None,
        adaln: tuple | None = None,
    ) -> jax.Array:
        return self.denoiser(
            x, timesteps, lengths, xf_proj, xf_out, deterministic,
            text_kv=text_kv, adaln=adaln,
        )

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        lengths: jax.Array,
        tokens: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        xf_proj, xf_out = self.encode_text(tokens, deterministic)
        return self.denoise(x, timesteps, lengths, xf_proj, xf_out, deterministic)


class SingleMotionModel(nn.Module):
    """Single-person denoiser + text stack (ref MotionTransformer,
    transformer.py:288-426 — the MotionDiffuse model used for t2m/kit and
    as the --pretrained weight donor)."""

    input_feats: int = 263
    num_frames: int = 196
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    text_latent_dim: int = 256
    text_ff_size: int = 2048
    text_num_heads: int = 4
    num_text_layers: int = 4
    dropout: float = 0.0
    efficient: bool = True
    clip_config: ClipTextConfig = ClipTextConfig()
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.latent_dim * 4

    def setup(self):
        from hig_tpu.models.denoiser import MotionDenoiser

        self.text = TextEncoder(
            clip_config=self.clip_config,
            text_latent_dim=self.text_latent_dim,
            text_ff_size=self.text_ff_size,
            text_num_heads=self.text_num_heads,
            num_text_layers=self.num_text_layers,
            time_embed_dim=self.time_embed_dim,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self.denoiser = MotionDenoiser(
            input_feats=self.input_feats,
            num_frames=self.num_frames,
            latent_dim=self.latent_dim,
            ff_size=self.ff_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            text_latent_dim=self.text_latent_dim,
            dropout=self.dropout,
            efficient=self.efficient,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
        )

    def encode_text(self, tokens: jax.Array, deterministic: bool = True):
        return self.text(tokens, deterministic)

    def text_kv(self, xf_out: jax.Array) -> tuple:
        return self.denoiser.text_kv(xf_out)

    def denoise(self, x, timesteps, lengths, xf_proj, xf_out, deterministic=True,
                text_kv=None):
        return self.denoiser(
            x, timesteps, lengths, xf_proj, xf_out, deterministic, text_kv=text_kv
        )

    def __call__(self, x, timesteps, lengths, tokens, deterministic=True):
        xf_proj, xf_out = self.encode_text(tokens, deterministic)
        return self.denoise(x, timesteps, lengths, xf_proj, xf_out, deterministic)


def model_from_config(
    cfg: ExperimentConfig, dtype=None, clip_config: ClipTextConfig | None = None
) -> InteractionModel:
    import jax.numpy as jnp  # local: avoid polluting module namespace

    dtype = dtype or (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32)
    return InteractionModel(
        clip_config=clip_config or ClipTextConfig(),
        input_feats=cfg.dim_pose,
        num_frames=cfg.max_motion_length,
        latent_dim=cfg.latent_dim,
        ff_size=cfg.ff_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        text_latent_dim=cfg.text_latent_dim,
        text_ff_size=cfg.text_ff_size,
        text_num_heads=cfg.text_num_heads,
        num_text_layers=cfg.num_text_layers,
        dropout=cfg.dropout,
        efficient=not cfg.no_eff,
        interaction=not cfg.no_cross_attn,
        cap_id=cfg.cap_id,
        use_pallas=getattr(cfg, "use_pallas", False),
        fused_blocks=getattr(cfg, "fused_blocks", False),
        causal=getattr(cfg, "causal", False),
        single_transformer=getattr(cfg, "single_transformer", False),
        fast_ln=getattr(cfg, "fast_ln", False),
        rms_norm=getattr(cfg, "rms_norm", False),
        cond_drop_prob=getattr(cfg, "cond_drop_prob", 0.0),
        dtype=dtype,
    )
