"""CVAE personality latent encoder (posterior over 91 steps, prior over 11).

Ref /root/reference/src/models/latent_encoder.py:14-202. The posterior sees
the full GT episode; the prior only the history. Both share the policy's
as2pl/as2tl cross-attention stacks by default (shared_transformer_as=True,
configs/model/traffic_bots.yaml:76) — in flax this is module sharing by
passing the parent's submodule instances as attributes. Temporal
downsampling (rate 5) keeps the sequence at 19 steps for the posterior.
"""
from __future__ import annotations

from typing import Any, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from ..config import (
    AgentInteractionConfig,
    AgentTemporalConfig,
    DistEncoderConfig,
    LatentEncoderConfig,
    TransformerConfig,
)
from ..distributions import DiagGaussian, DummyLatent, MultiCategorical
from .modules import MLP, MultiAgentTF, StackedGRU, TransformerBlock, temporal_aggregate

LatentDist = Union[DiagGaussian, DummyLatent, MultiCategorical]


class DistEncoder(nn.Module):
    """Map an aggregated feature to a latent distribution. Ref latent_encoder.py:150-202."""

    cfg: DistEncoderConfig
    hidden_dim: int
    out_dim: int

    @property
    def skip_forward(self) -> bool:
        return self.cfg.dist_type in ("dummy", "std_gaus")

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray, deterministic: bool = True) -> LatentDist:
        dt = self.cfg.dist_type
        if dt == "dummy":
            return DummyLatent(zeros=jnp.zeros((*valid.shape, self.out_dim), x.dtype), valid=valid)
        if dt == "std_gaus":
            log_std = self.param("log_std", lambda k: jnp.full((self.out_dim,), self.cfg.log_std or 0.0))
            # frozen in the reference (requires_grad=False); stop-gradient here
            log_std = jnp.asarray(log_std)
            return DiagGaussian(
                mean=jnp.zeros((*valid.shape, self.out_dim), x.dtype),
                log_std=jnp.broadcast_to(log_std, (*valid.shape, self.out_dim)),
                valid=valid,
            )
        if dt == "diag_gaus":
            mean = MLP(
                [self.hidden_dim, self.out_dim], end_layer_activation=False,
                use_layernorm=self.cfg.use_layernorm, dropout_p=None, name="mlp_mean",
            )(x, valid, deterministic=deterministic)
            if self.cfg.log_std is None:
                log_std = MLP(
                    [self.hidden_dim, self.out_dim], end_layer_activation=False,
                    use_layernorm=self.cfg.use_layernorm, dropout_p=None, name="mlp_log_std",
                )(x, valid, deterministic=deterministic)
            else:
                log_std_p = self.param("log_std", lambda k: jnp.full((self.out_dim,), self.cfg.log_std))
                log_std = jnp.broadcast_to(log_std_p, mean.shape)
            return DiagGaussian(mean=mean, log_std=log_std, valid=valid)
        if dt == "cat":
            assert self.out_dim % self.cfg.n_cat == 0
            n_class = self.out_dim // self.cfg.n_cat
            logits = MLP(
                [self.hidden_dim, self.out_dim], end_layer_activation=False,
                use_layernorm=self.cfg.use_layernorm, dropout_p=None, name="mlp_logits",
            )(x, valid, deterministic=deterministic)
            logits = logits.reshape(*valid.shape, self.cfg.n_cat, n_class)
            return MultiCategorical(probs=nn.softmax(logits, axis=-1), valid=valid)
        raise NotImplementedError(dt)


class LatentEncoder(nn.Module):
    cfg: LatentEncoderConfig
    tf_cfg: TransformerConfig
    agent_temporal: AgentTemporalConfig
    agent_interaction: AgentInteractionConfig
    temporal_aggregate_mode: str
    interaction_first: bool
    # shared with the policy when cfg.shared_transformer_as
    transformer_as2pl: Optional[nn.Module] = None
    transformer_as2tl: Optional[nn.Module] = None
    n_layer_tf_as2pl: int = 3
    n_layer_tf_as2tl: int = 3
    # fused-attention query blocking for the big as2pl (see config.py
    # attn_row_block): <0 = whole-S blocks, skip off (default)
    attn_row_block: int = -1
    compute_dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.cfg.latent_dim

    @property
    def dummy(self) -> bool:
        return self.cfg.latent_post.dist_type == "dummy"

    def setup(self):
        hidden = self.tf_cfg.d_model
        from .map_encoder import tf_block_kwargs

        if self.cfg.shared_transformer_as:
            assert self.transformer_as2pl is not None and self.transformer_as2tl is not None
            self.as2pl = self.transformer_as2pl
            self.as2tl = self.transformer_as2tl
        else:
            kw = tf_block_kwargs(self.tf_cfg)
            self.as2pl = TransformerBlock(
                n_layer=self.n_layer_tf_as2pl, compute_dtype=self.compute_dtype, name="as2pl", **kw
            )
            self.as2tl = TransformerBlock(
                n_layer=self.n_layer_tf_as2tl, compute_dtype=self.compute_dtype, name="as2tl", **kw
            )

        self.prior_dist = DistEncoder(cfg=self.cfg.latent_prior, hidden_dim=hidden, out_dim=self.cfg.latent_dim)
        self.post_dist = DistEncoder(cfg=self.cfg.latent_post, hidden_dim=hidden, out_dim=self.cfg.latent_dim)

        if not self.post_dist.skip_forward:
            ai = self.agent_interaction
            tf_kwargs = dict(
                d_feedforward=self.tf_cfg.d_feedforward, n_head=self.tf_cfg.n_head,
                dropout_p=self.tf_cfg.dropout_p, activation=self.tf_cfg.activation,
                norm_first=self.tf_cfg.norm_first, bias=self.tf_cfg.bias,
            )
            self.temporal_post = StackedGRU(
                hidden_dim=hidden, num_layers=self.agent_temporal.num_layers,
                dropout=self.agent_temporal.dropout, kind=self.agent_temporal.kind,
                name="temporal_post",
            )
            self.interaction_post = MultiAgentTF(
                hidden_dim=hidden, n_layer=ai.n_layer, mask_self_agent=ai.mask_self_agent,
                detach_tgt=ai.detach_tgt, attn_to_map_aware_feature=ai.attn_to_map_aware_feature,
                tf_kwargs=tf_kwargs, compute_dtype=self.compute_dtype, name="interaction_post",
            )
            if not self.prior_dist.skip_forward:
                if self.cfg.shared_post_prior_net:
                    self.temporal_prior = self.temporal_post
                    self.interaction_prior = self.interaction_post
                else:
                    self.temporal_prior = StackedGRU(
                        hidden_dim=hidden, num_layers=self.agent_temporal.num_layers,
                        dropout=self.agent_temporal.dropout, kind=self.agent_temporal.kind,
                        name="temporal_prior",
                    )
                    self.interaction_prior = MultiAgentTF(
                        hidden_dim=hidden, n_layer=ai.n_layer, mask_self_agent=ai.mask_self_agent,
                        detach_tgt=ai.detach_tgt, attn_to_map_aware_feature=ai.attn_to_map_aware_feature,
                        tf_kwargs=tf_kwargs, compute_dtype=self.compute_dtype, name="interaction_prior",
                    )

    def __call__(
        self,
        agent_feature: jnp.ndarray,  # [n_scene, n_step, n_agent, d]
        agent_feature_valid: jnp.ndarray,  # [n_scene, n_step, n_agent]
        map_feature: jnp.ndarray,  # [n_scene, n_pl, d]
        map_feature_valid: jnp.ndarray,  # [n_scene, n_pl]
        tl_feature: Optional[jnp.ndarray] = None,  # [n_scene, n_step, n_tl, d]
        tl_feature_valid: Optional[jnp.ndarray] = None,
        posterior: bool = False,
        deterministic: bool = True,
    ) -> LatentDist:
        """Ref latent_encoder.py:70-147."""
        dist_enc = self.post_dist if posterior else self.prior_dist
        if dist_enc.skip_forward:
            return dist_enc(agent_feature[:, 0], jnp.any(agent_feature_valid, axis=1), deterministic)

        r = self.cfg.temporal_down_sample_rate
        if r > 1:
            assert (agent_feature_valid.shape[1] - 1) % r == 0
            agent_feature = agent_feature[:, ::r]
            agent_feature_valid = agent_feature_valid[:, ::r]
            tl_feature = tl_feature[:, ::r]
            tl_feature_valid = tl_feature_valid[:, ::r]

        n_scene, n_step, n_agent, d = agent_feature.shape

        # cross-attn to map over flattened (step*agent) tokens
        x, _ = self.as2pl(
            agent_feature.reshape(n_scene, n_step * n_agent, d),
            src_padding_mask=~agent_feature_valid.reshape(n_scene, n_step * n_agent),
            tgt=map_feature,
            tgt_padding_mask=~map_feature_valid,
            deterministic=deterministic,
            # fused: the XLA alternative materializes [B, H, S*A, n_pl]
            # logits that scale with batch (measured win at batch 128).
            # when the dead-row skip is opted in (attn_row_block >= 0), live
            # rows are strided with period n_agent (step-major flatten; real
            # agents are a per-step prefix), so an explicit block size is
            # honored only when it tiles the tokens AND is no coarser than
            # n_agent (else it could never skip); otherwise coerce to 16
            # (see the config.py attn_row_block comment)
            row_block=(
                self.attn_row_block if self.attn_row_block < 0
                else (
                    self.attn_row_block
                    if 0 < self.attn_row_block <= n_agent
                    and (n_step * n_agent) % self.attn_row_block == 0
                    else (16 if (n_step * n_agent) % 16 == 0 else 0)
                )
            ),
        )
        x = x.reshape(n_scene, n_step, n_agent, d)
        # cross-attn to this step's traffic lights, per step
        x, _ = self.as2tl(
            x.reshape(n_scene * n_step, n_agent, d),
            src_padding_mask=~agent_feature_valid.reshape(n_scene * n_step, n_agent),
            tgt=tl_feature.reshape(n_scene * n_step, -1, d),
            tgt_padding_mask=~tl_feature_valid.reshape(n_scene * n_step, -1),
            deterministic=deterministic,
        )
        x = x.reshape(n_scene, n_step, n_agent, d)

        temporal = self.temporal_post if posterior else self.temporal_prior
        interaction = self.interaction_post if posterior else self.interaction_prior

        if self.interaction_first:
            x, _ = interaction(x, agent_feature, agent_feature_valid, deterministic=deterministic, allow_fused=False)
            x, _ = temporal(x, agent_feature_valid, deterministic=deterministic)
        else:
            x, _ = temporal(x, agent_feature_valid, deterministic=deterministic)
            x, _ = interaction(x, agent_feature, agent_feature_valid, deterministic=deterministic, allow_fused=False)

        x, latent_valid = temporal_aggregate(x, agent_feature_valid, self.temporal_aggregate_mode)
        return dist_enc(x, latent_valid, deterministic)
