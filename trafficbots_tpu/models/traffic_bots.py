"""TrafficBots policy: all encoders + one-step policy as flax methods.

Ref /root/reference/src/models/traffic_bots.py:18-247 plus the per-step glue
of waymo_motion.py:108-203. The reference carries mutable state on the module
(`self.hidden`, cached `self.latent_sample`); here every per-rollout quantity
is explicit data threaded through the scan carry, and the module only holds
parameters:

  - encode_input_features: map/tl/agent encoders, run once per episode view.
  - policy_step: ONE closed-loop step — cross-attention to map and traffic
    lights, agent interaction, GRU update, goal/latent injection, action
    head. Called 90x inside `lax.scan` (see sim/rollout.py).
  - latent: CVAE posterior/prior distribution.
  - pred_goal: destination / goal prediction.

The action head lives in this module too (the reference keeps it on the
LightningModule; folding it here gives a single apply per rollout step).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..config import DataConfig, ExperimentConfig, ModelConfig, ActionHeadConfig
from .goal_manager import GoalManager
from .latent_encoder import LatentEncoder
from .map_encoder import MapEncoder, tf_block_kwargs
from .modules import (
    ActionHead,
    AddLatentGoal,
    InputPeEncoder,
    MultiAgentTF,
    StackedGRU,
    TransformerBlock,
)
from ..geometry import pose_pe_out_dim


class TrafficBots(nn.Module):
    cfg: ModelConfig
    action_head_cfg: ActionHeadConfig
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        hidden = cfg.hidden_dim
        pe_dim_out = pose_pe_out_dim(cfg.pose_pe_map, cfg.pe_dim)
        kw = tf_block_kwargs(cfg.tf_cfg)

        self.map_encoder = MapEncoder(
            hidden_dim=hidden, pe_dim=pe_dim_out, cfg=cfg.map_encoder,
            pe_cfg=cfg.input_pe_encoder, tf_cfg=cfg.tf_cfg, compute_dtype=self.compute_dtype,
        )
        ipe = cfg.input_pe_encoder
        self.tl_encoder = InputPeEncoder(
            hidden_dim=hidden, pe_dim=pose_pe_out_dim(cfg.pose_pe_tl, cfg.pe_dim),
            n_layer=ipe.n_layer, mlp_dropout_p=ipe.mlp_dropout_p,
            mlp_use_layernorm=ipe.mlp_use_layernorm, pe_mode=ipe.pe_mode,
            compute_dtype=self.compute_dtype,
        )
        self.agent_encoder = InputPeEncoder(
            hidden_dim=hidden, pe_dim=pose_pe_out_dim(cfg.pose_pe_agent, cfg.pe_dim),
            n_layer=ipe.n_layer, mlp_dropout_p=ipe.mlp_dropout_p,
            mlp_use_layernorm=ipe.mlp_use_layernorm, pe_mode=ipe.pe_mode,
            compute_dtype=self.compute_dtype,
        )
        self.transformer_as2pl = TransformerBlock(
            n_layer=cfg.n_layer_tf_as2pl, compute_dtype=self.compute_dtype, **kw
        )
        self.transformer_as2tl = TransformerBlock(
            n_layer=cfg.n_layer_tf_as2tl, compute_dtype=self.compute_dtype, **kw
        )
        self.goal_manager = GoalManager(
            cfg=cfg.goal_manager, tf_cfg=cfg.tf_cfg, compute_dtype=self.compute_dtype
        )
        self.latent_encoder = LatentEncoder(
            cfg=cfg.latent_encoder, tf_cfg=cfg.tf_cfg,
            agent_temporal=cfg.agent_temporal, agent_interaction=cfg.agent_interaction,
            temporal_aggregate_mode=cfg.temporal_aggregate_mode,
            interaction_first=cfg.interaction_first,
            transformer_as2pl=self.transformer_as2pl if cfg.latent_encoder.shared_transformer_as else None,
            transformer_as2tl=self.transformer_as2tl if cfg.latent_encoder.shared_transformer_as else None,
            n_layer_tf_as2pl=cfg.n_layer_tf_as2pl, n_layer_tf_as2tl=cfg.n_layer_tf_as2tl,
            attn_row_block=cfg.attn_row_block,
            compute_dtype=self.compute_dtype,
        )
        self.agent_temporal = StackedGRU(
            hidden_dim=hidden, num_layers=cfg.agent_temporal.num_layers,
            dropout=cfg.agent_temporal.dropout, kind=cfg.agent_temporal.kind,
        )
        ai = cfg.agent_interaction
        tf_kwargs = dict(
            d_feedforward=cfg.tf_cfg.d_feedforward, n_head=cfg.tf_cfg.n_head,
            dropout_p=cfg.tf_cfg.dropout_p, activation=cfg.tf_cfg.activation,
            norm_first=cfg.tf_cfg.norm_first, bias=cfg.tf_cfg.bias,
        )
        self.agent_interaction_tf = MultiAgentTF(
            hidden_dim=hidden, n_layer=ai.n_layer, mask_self_agent=ai.mask_self_agent,
            detach_tgt=ai.detach_tgt, attn_to_map_aware_feature=ai.attn_to_map_aware_feature,
            tf_kwargs=tf_kwargs, compute_dtype=self.compute_dtype,
        )
        ag = cfg.add_goal
        self.add_goal = AddLatentGoal(
            hidden_dim=hidden, in_dim=self.goal_manager.out_dim, dummy=self.goal_manager.dummy,
            mode=ag.mode, res_cat=ag.res_cat, res_add=ag.res_add,
            n_layer_mlp_in=ag.n_layer_mlp_in, n_layer_mlp_out=ag.n_layer_mlp_out,
            mlp_in_use_layernorm=ag.mlp_in_use_layernorm,
            mlp_out_use_layernorm=ag.mlp_out_use_layernorm, mlp_dropout_p=ag.dropout_p,
        )
        al = cfg.add_latent
        self.add_latent = AddLatentGoal(
            hidden_dim=hidden, in_dim=cfg.latent_encoder.latent_dim,
            dummy=self.latent_encoder.dummy,
            mode=al.mode, res_cat=al.res_cat, res_add=al.res_add,
            n_layer_mlp_in=al.n_layer_mlp_in, n_layer_mlp_out=al.n_layer_mlp_out,
            mlp_in_use_layernorm=al.mlp_in_use_layernorm,
            mlp_out_use_layernorm=al.mlp_out_use_layernorm, mlp_dropout_p=al.dropout_p,
        )
        if cfg.n_layer_final_mlp > 0:
            from .modules import MLP
            self.final_mlp = MLP(
                [hidden] * cfg.n_layer_final_mlp, dropout_p=0.1, use_layernorm=False
            )
        else:
            self.final_mlp = None
        self.action_head = ActionHead(
            hidden_dim=hidden, action_dim=2,
            use_layernorm=self.action_head_cfg.use_layernorm,
            log_std_init=self.action_head_cfg.log_std,
            branch_type=self.action_head_cfg.branch_type,
        )

    # -- needed so linen initializes every submodule; mirrors a full step
    def __call__(self, *args, **kwargs):
        raise NotImplementedError("use the named methods via apply(..., method=...)")

    def encode_input_features(
        self,
        agent_valid: jnp.ndarray,
        agent_attr: jnp.ndarray,
        agent_pe: jnp.ndarray,
        map_valid: jnp.ndarray,
        map_attr: jnp.ndarray,
        map_pe: jnp.ndarray,
        tl_valid: jnp.ndarray,
        tl_attr: jnp.ndarray,
        tl_pe: jnp.ndarray,
        agent_pos: Optional[jnp.ndarray] = None,
        map_pos: Optional[jnp.ndarray] = None,
        tl_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        map_feature: Optional[jnp.ndarray] = None,
        map_feature_valid: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Ref traffic_bots.py:109-151.

        `map_feature`/`map_feature_valid` short-circuit the map encoder with a
        precomputed encoding: the three episode views (input / latent_post /
        latent_prior) share an identical map whenever the SE(2) perturbation
        of the latent input is disabled (the default), and the map encoder is
        the single heaviest encoder — encode once, reuse thrice.
        """
        if map_feature is None:
            map_feature, map_feature_valid = self.map_encoder(
                map_valid, map_attr, map_pe, deterministic=deterministic
            )
        return {
            "agent_feature": self.agent_encoder(agent_valid, agent_attr, agent_pe, deterministic=deterministic),
            "agent_feature_valid": agent_valid,
            "map_feature": map_feature,
            "map_feature_valid": map_feature_valid,
            "tl_feature": self.tl_encoder(tl_valid, tl_attr, tl_pe, deterministic=deterministic),
            "tl_feature_valid": tl_valid,
        }

    def encode_agent(self, valid, attr, pe, deterministic: bool = True) -> jnp.ndarray:
        """Per-rollout-step agent encoding (ref waymo_motion.py:155)."""
        return self.agent_encoder(valid, attr, pe, deterministic=deterministic)

    def map_only(self, map_valid, map_attr, map_pe, deterministic: bool = True):
        """Map encoding alone (profiling / staged-encoding helper)."""
        return self.map_encoder(map_valid, map_attr, map_pe, deterministic=deterministic)

    def latent(self, posterior: bool = False, deterministic: bool = True, **features):
        return self.latent_encoder(posterior=posterior, deterministic=deterministic, **features)

    def pred_goal(self, deterministic: bool = True, **kwargs):
        return self.goal_manager.pred_goal(deterministic=deterministic, **kwargs)

    def precompute_map_kv(self, map_feature: jnp.ndarray, allow_bf16: bool = True):
        """Per-layer K/V projections of the (step-invariant) map tokens for
        the as2pl cross-attention — computed once per episode instead of once
        per rollout step per layer (the dominant per-step matmul: 1024 tokens
        vs 64 agents). Returns a tuple of (k, v) per layer.

        With cfg.map_kv_bf16 (and allow_bf16 — the rollout disables it in
        TRAINING so gradients keep the reference's fp32 precision) the cache
        is stored in bf16: every rollout step re-reads it from HBM (batch x
        ~1 MB x n_layers), so halving it cuts the scan's dominant memory
        traffic; the attention logits still accumulate in fp32.
        """
        kv = self.transformer_as2pl(None, tgt=map_feature, return_tgt_kv=True)
        if self.cfg.map_kv_bf16 and allow_bf16:
            kv = tuple((k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)) for k, v in kv)
        return kv

    def precompute_add_feats(
        self,
        goal_feature: Optional[jnp.ndarray],
        goal_valid: Optional[jnp.ndarray],
        latent_sample: Optional[jnp.ndarray],
        latent_valid: Optional[jnp.ndarray],
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Hoist the step-invariant halves of the goal/latent injections:
        both z-inputs (gathered goal feature, cached latent sample) are
        constant across a rollout, so their 2-layer input MLPs run once per
        episode instead of once per step. Eval-only (dropout must be off).
        """
        goal_pre = None
        if goal_feature is not None and not self.add_goal.dummy:
            goal_pre = self.add_goal.precompute_z(goal_feature, goal_valid)
        latent_pre = None
        if latent_sample is not None and not self.add_latent.dummy:
            latent_pre = self.add_latent.precompute_z(latent_sample, latent_valid)
        return goal_pre, latent_pre

    def policy_step(
        self,
        agent_valid: jnp.ndarray,  # [B, A]
        agent_feature: jnp.ndarray,  # [B, A, d]
        map_valid: jnp.ndarray,  # [B, P]
        map_feature: jnp.ndarray,  # [B, P, d]
        tl_valid: jnp.ndarray,  # [B, T_tl]
        tl_feature: jnp.ndarray,  # [B, T_tl, d]
        goal_valid: Optional[jnp.ndarray],  # [B, A]
        goal_feature: Optional[jnp.ndarray],  # [B, A, out_dim]
        latent_sample: Optional[jnp.ndarray],  # [B, A, latent_dim]
        hidden: jnp.ndarray,  # [L, B, A, d] GRU carry
        agent_type: jnp.ndarray,  # [B, A, 3]
        need_weights: bool = False,
        deterministic: bool = True,
        map_kv=None,  # per-layer (k, v) from precompute_map_kv
        goal_z_pre: Optional[jnp.ndarray] = None,  # from precompute_add_feats
        latent_z_pre: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """One policy step. Ref traffic_bots.py:163-247 + action head.

        Returns (action_mean, action_log_std, new_hidden, policy_feature, attn).
        """
        cfg = self.cfg
        x = agent_feature

        x, attn_pl = self.transformer_as2pl(
            x, src_padding_mask=~agent_valid,
            tgt=None if map_kv is not None else map_feature,
            tgt_padding_mask=~map_valid, need_weights=need_weights,
            deterministic=deterministic, tgt_kv=map_kv,
            row_block=self.cfg.attn_row_block,
        )
        x, attn_tl = self.transformer_as2tl(
            x, src_padding_mask=~agent_valid, tgt=tl_feature,
            tgt_padding_mask=~tl_valid, need_weights=need_weights,
            deterministic=deterministic,
            allow_fused=self.cfg.fused_attention_small_t,
        )

        def add_goal_latent(x):
            x = self.add_goal(
                x, agent_valid, goal_feature, goal_valid,
                deterministic=deterministic, z_pre=goal_z_pre,
            )
            x = self.add_latent(
                x, agent_valid, latent_sample, agent_valid,
                deterministic=deterministic, z_pre=latent_z_pre,
            )
            return x

        if cfg.add_goal_latent_first:
            x = add_goal_latent(x)

        if cfg.interaction_first:
            x, attn_agent = self.agent_interaction_tf(
                x, agent_feature, agent_valid, need_weights=need_weights,
                deterministic=deterministic, allow_fused=self.cfg.fused_attention_small_t,
            )
            x, hidden = self.agent_temporal(x, agent_valid, hidden, deterministic=deterministic)
        else:
            x, hidden = self.agent_temporal(x, agent_valid, hidden, deterministic=deterministic)
            x, attn_agent = self.agent_interaction_tf(
                x, agent_feature, agent_valid, need_weights=need_weights,
                deterministic=deterministic, allow_fused=self.cfg.fused_attention_small_t,
            )
        # remat tag: under remat_policy="save_core" the scan saves the
        # temporal/interaction output so the backward re-forward skips the
        # GRU stack (its gate chain is recompute-heavy relative to its size)
        x = checkpoint_name(x, "gru_core")

        if not cfg.add_goal_latent_first:
            x = add_goal_latent(x)

        if self.final_mlp is not None:
            x = self.final_mlp(x, agent_valid, deterministic=deterministic)
        # remat tag (save_core): the action-head input feature
        x = checkpoint_name(x, "policy_feat")

        action_mean, action_log_std = self.action_head(
            x, agent_valid, agent_type, deterministic=deterministic
        )
        attn = {}
        if need_weights:
            attn = {"attn_pl": attn_pl, "attn_tl": attn_tl, "attn_agent": attn_agent}
        return action_mean, action_log_std, hidden, x, attn

    def init_hidden(self, n_batch: int, n_agent: int) -> jnp.ndarray:
        return jnp.zeros(
            (self.cfg.agent_temporal.num_layers, n_batch, n_agent, self.cfg.hidden_dim)
        )

    def init_all(self, batch: Dict[str, jnp.ndarray]) -> None:
        """Touch every submodule once so `model.init` creates all params.

        `batch` is a pre-processed batch (data.preprocessing.pre_processing)
        containing the input/, latent_prior/, latent_post/, ref/, gt/ keys.
        """
        from ..data.preprocessing import extract

        input_dict = extract(batch, "input")
        feat = self.encode_input_features(**input_dict)
        if "latent_post/agent_valid" in batch:
            post = extract(batch, "latent_post")
            self.latent(posterior=True, **self.encode_input_features(**post))
        prior = extract(batch, "latent_prior")
        self.latent(posterior=False, **self.encode_input_features(**prior))
        if not self.goal_manager.dummy:
            self.pred_goal(
                agent_type=batch["ref/agent_type"],
                map_type=batch["ref/map_type"],
                agent_state=batch["ref/agent_state"],
                **feat,
            )
        B, _, A = input_dict["agent_valid"].shape
        goal_feature = None
        goal_valid = None
        if not self.goal_manager.dummy:
            goal_feature = jnp.zeros((B, A, self.goal_manager.out_dim))
            goal_valid = jnp.zeros((B, A), dtype=bool)
        latent_sample = None
        if not self.latent_encoder.dummy:
            latent_sample = jnp.zeros((B, A, self.cfg.latent_encoder.latent_dim))
        self.policy_step(
            agent_valid=input_dict["agent_valid"][:, 0],
            agent_feature=feat["agent_feature"][:, 0],
            map_valid=feat["map_feature_valid"],
            map_feature=feat["map_feature"],
            tl_valid=feat["tl_feature_valid"][:, 0],
            tl_feature=feat["tl_feature"][:, 0],
            goal_valid=goal_valid,
            goal_feature=goal_feature,
            latent_sample=latent_sample,
            hidden=self.init_hidden(B, A),
            agent_type=batch["ref/agent_type"],
        )
