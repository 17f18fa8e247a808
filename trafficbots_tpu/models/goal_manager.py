"""Goal/destination conditioning: GT extraction, prediction heads, features.

Ref /root/reference/src/models/goal_manager.py:14-423. Three modes:
  - "dest" (default): goal = map polyline index; feature = gathered map
    feature; DestPredictor produces [n_scene, n_agent, n_pl] logits with
    per-agent-type lane-type masks.
  - "goal_xy": goal = final (x, y); optionally re-encoded in the agent's
    local frame every rollout step (update_goal); GoalPredictor outputs a
    DiagGaussian over xy.
  - "dummy": no goal conditioning (SimNet).

TPU notes: the per-(agent, polyline) "mlp" head is a [A, P, 2d] -> 1 MLP —
a large dense batch that maps cleanly onto the MXU. The "transformer" heads
expand the 1024-polyline map per agent (SURVEY.md hard-part #6); they are
implemented for parity but "mlp"/"attn" are the production paths.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import GoalManagerConfig, TransformerConfig
from ..distributions import DestCategorical, DiagGaussian
from ..geometry import pos2global, pos2local, rad2rot
from .modules import MLP, Attention, StackedGRU, TransformerBlock, temporal_aggregate


def _dest_type_masks(agent_type: jnp.ndarray, map_type: jnp.ndarray, map_feature_valid: jnp.ndarray):
    """Per-type destination masks. Ref goal_manager.py:233-244.

    WOMD pl types: FREEWAY=0, SURFACE_STREET=1, STOP_SIGN=2, BIKE_LANE=3,
    ROAD_EDGE_BOUNDARY=4. Vehicles exclude bike lanes; pedestrians exclude
    all lanes; cyclists exclude car lanes.
    Returns (map_type_mask [S, P] True=excluded, attn_mask [S, A, P] True=excluded).
    """
    map_type_mask = ~(map_feature_valid & jnp.any(map_type[:, :, :5], axis=-1))
    m_veh = agent_type[:, :, 0:1] & map_type[:, :, 3][:, None, :]
    m_ped = agent_type[:, :, 1:2] & jnp.any(map_type[:, :, :4], axis=-1)[:, None, :]
    m_cyc = agent_type[:, :, 2:3] & jnp.any(map_type[:, :, :3], axis=-1)[:, None, :]
    return map_type_mask, (m_veh | m_ped | m_cyc)


class DestPredictor(nn.Module):
    """Destination (polyline index) predictor. Ref goal_manager.py:165-333."""

    tf_cfg: TransformerConfig
    mode: str = "mlp"
    n_layer_gru: int = 3
    use_layernorm: bool = True
    res_add_gru: bool = True
    detach_features: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        agent_type: jnp.ndarray,  # [S, A, 3]
        map_type: jnp.ndarray,  # [S, P, 11]
        agent_state: jnp.ndarray,  # [S, T, A, 4]
        agent_feature: jnp.ndarray,  # [S, T, A, d]
        agent_feature_valid: jnp.ndarray,  # [S, T, A]
        map_feature: jnp.ndarray,  # [S, P, d]
        map_feature_valid: jnp.ndarray,  # [S, P]
        tl_feature: Optional[jnp.ndarray] = None,
        tl_feature_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> DestCategorical:
        hidden = self.tf_cfg.d_model
        if self.detach_features:
            agent_feature = jax.lax.stop_gradient(agent_feature)
            map_feature = jax.lax.stop_gradient(map_feature)

        map_type_mask, attn_mask = _dest_type_masks(agent_type, map_type, map_feature_valid)
        S, P, d = map_feature.shape
        A = agent_feature_valid.shape[2]
        dist_valid = jnp.any(agent_feature_valid, axis=1)

        from .map_encoder import tf_block_kwargs

        def gru_then_aggregate(x):
            if self.n_layer_gru > 0:
                y, _ = StackedGRU(
                    hidden_dim=hidden, num_layers=self.n_layer_gru,
                    dropout=self.tf_cfg.dropout_p, name="gru_as",
                )(x, agent_feature_valid, deterministic=deterministic)
                if self.res_add_gru:
                    y = y + x
            else:
                y = x
            return temporal_aggregate(y, agent_feature_valid, "last_valid")

        if self.mode in ("transformer", "transformer_aggr"):
            if self.mode == "transformer_aggr":
                tgt, tgt_valid = gru_then_aggregate(agent_feature)
                tgt = tgt.reshape(S * A, 1, d)
                tgt_valid = tgt_valid.reshape(S * A, 1)
            else:
                k_skip = 2
                tgt = jnp.swapaxes(agent_feature, 1, 2)[:, :, ::k_skip].reshape(S * A, -1, d)
                tgt_valid = jnp.swapaxes(agent_feature_valid, 1, 2)[:, :, ::k_skip].reshape(S * A, -1)
            map_rep = jnp.broadcast_to(map_feature[:, None], (S, A, P, d)).reshape(S * A, P, d)
            map_rep_valid = jnp.broadcast_to(map_feature_valid[:, None], (S, A, P)).reshape(S * A, P)
            map_rep, _ = TransformerBlock(
                n_layer=1, compute_dtype=self.compute_dtype, name="pl2as",
                **tf_block_kwargs(self.tf_cfg),
            )(
                map_rep, src_padding_mask=~map_rep_valid, tgt=tgt,
                tgt_padding_mask=~tgt_valid, deterministic=deterministic,
            )
            logits = MLP(
                [hidden, 1], end_layer_activation=False, use_layernorm=self.use_layernorm,
                dropout_p=None, name="mlp",
            )(map_rep.reshape(S, A, P, d), deterministic=deterministic)[..., 0]
        elif self.mode == "mlp":
            tgt, _ = gru_then_aggregate(agent_feature)  # [S, A, d]
            # factored pair input: fc0(concat(map-per-pl, agent-per-ag)) runs
            # as two small matmuls + broadcast-add — the [S, A, P, 2d] concat
            # of ref goal_manager.py:294-300 never materializes (~2 GB and
            # ~400 redundant GFLOPs per train step at full scale)
            logits = MLP(
                [hidden, hidden, 1], end_layer_activation=False,
                use_layernorm=self.use_layernorm, dropout_p=None, name="mlp",
            )(
                (map_feature[:, None], tgt[:, :, None]), deterministic=deterministic
            )[..., 0]
        elif self.mode == "attn":
            src, _ = gru_then_aggregate(agent_feature)  # [S, A, d]
            _, probs = Attention(
                d_model=hidden, n_head=self.tf_cfg.n_head, dropout_p=self.tf_cfg.dropout_p,
                bias=self.tf_cfg.bias, compute_dtype=self.compute_dtype, name="attn",
            )(
                src, tgt=map_feature, tgt_padding_mask=map_type_mask,
                attn_mask=attn_mask, need_weights=True, deterministic=deterministic,
            )
            logits = jnp.log(jnp.maximum(probs, jnp.finfo(probs.dtype).tiny))
        else:
            raise NotImplementedError(self.mode)

        # mask excluded polylines; rows fully masked get flat logits (ref :329-332)
        logits = jnp.where(map_type_mask[:, None, :], -jnp.inf, logits)
        logits = jnp.where(attn_mask, -jnp.inf, logits)
        logits = jnp.where(dist_valid[..., None], logits, 0.0)
        all_masked = jnp.all(jnp.isneginf(logits), axis=-1, keepdims=True)
        logits = jnp.where(all_masked, 0.0, logits)
        return DestCategorical.from_logits(logits, valid=dist_valid)


class GoalPredictor(nn.Module):
    """(x, y) goal predictor -> DiagGaussian. Ref goal_manager.py:336-423."""

    tf_cfg: TransformerConfig
    goal_in_local: bool = True
    n_layer_gru: int = 3
    use_layernorm: bool = True
    res_add_gru: bool = True
    detach_features: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        agent_type: jnp.ndarray,
        map_type: jnp.ndarray,
        agent_state: jnp.ndarray,  # [S, T, A, 4]
        agent_feature: jnp.ndarray,
        agent_feature_valid: jnp.ndarray,
        map_feature: jnp.ndarray,
        map_feature_valid: jnp.ndarray,
        tl_feature: Optional[jnp.ndarray] = None,
        tl_feature_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> DiagGaussian:
        hidden = self.tf_cfg.d_model
        if self.detach_features:
            agent_feature = jax.lax.stop_gradient(agent_feature)
            map_feature = jax.lax.stop_gradient(map_feature)

        from .map_encoder import tf_block_kwargs

        if self.n_layer_gru > 0:
            src, _ = StackedGRU(
                hidden_dim=hidden, num_layers=self.n_layer_gru,
                dropout=self.tf_cfg.dropout_p, name="gru_as",
            )(agent_feature, agent_feature_valid, deterministic=deterministic)
            if self.res_add_gru:
                src = src + agent_feature
        else:
            src = agent_feature
        src, src_valid = temporal_aggregate(src, agent_feature_valid, "last_valid")

        goal_feature, _ = TransformerBlock(
            n_layer=1, compute_dtype=self.compute_dtype, name="as2pl",
            **tf_block_kwargs(self.tf_cfg),
        )(
            src, src_padding_mask=~src_valid, tgt=map_feature,
            tgt_padding_mask=~map_feature_valid, deterministic=deterministic,
        )
        goal_mean = MLP(
            [hidden, 2], end_layer_activation=False, use_layernorm=self.use_layernorm,
            dropout_p=None, name="mlp_mean",
        )(goal_feature, deterministic=deterministic)

        if self.goal_in_local:
            ref_pos = agent_state[:, -1, :, :2][..., None, :]  # [S, A, 1, 2]
            ref_rot = rad2rot(agent_state[:, -1, :, 2])  # [S, A, 2, 2]
            goal_mean = pos2global(goal_mean[..., None, :], ref_pos, ref_rot)[..., 0, :]

        goal_valid = jnp.any(agent_feature_valid, axis=1)
        goal_mean = jnp.where(goal_valid[..., None], goal_mean, 0.0)
        log_std = self.param("log_std", lambda k: jnp.full((2,), 2.0))
        return DiagGaussian(mean=goal_mean, log_std=jnp.broadcast_to(log_std, goal_mean.shape), valid=goal_valid)


class GoalManager(nn.Module):
    """Ref goal_manager.py:14-162."""

    cfg: GoalManagerConfig
    tf_cfg: TransformerConfig
    compute_dtype: Any = jnp.float32

    @property
    def dummy(self) -> bool:
        return self.cfg.goal_attr_mode == "dummy"

    @property
    def update_goal(self) -> bool:
        return self.cfg.goal_attr_mode == "goal_xy" and self.cfg.goal_in_local

    @property
    def out_dim(self) -> int:
        if self.cfg.goal_attr_mode == "dest":
            return self.tf_cfg.d_model
        if self.cfg.goal_attr_mode == "goal_xy":
            return 2
        return -1

    def setup(self):
        gp = self.cfg.goal_predictor
        if self.cfg.goal_attr_mode == "dest":
            self.predictor = DestPredictor(
                tf_cfg=self.tf_cfg, mode=gp.mode, n_layer_gru=gp.n_layer_gru,
                use_layernorm=gp.use_layernorm, res_add_gru=gp.res_add_gru,
                detach_features=gp.detach_features, compute_dtype=self.compute_dtype,
            )
        elif self.cfg.goal_attr_mode == "goal_xy":
            self.predictor = GoalPredictor(
                tf_cfg=self.tf_cfg, goal_in_local=self.cfg.goal_in_local,
                n_layer_gru=gp.n_layer_gru, use_layernorm=gp.use_layernorm,
                res_add_gru=gp.res_add_gru, detach_features=gp.detach_features,
                compute_dtype=self.compute_dtype,
            )
        else:
            self.predictor = None

    def get_gt_goal(
        self, agent_valid: jnp.ndarray, gt_goal: jnp.ndarray, gt_dest: jnp.ndarray
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Ref goal_manager.py:49-75. (pure; no params)"""
        if self.cfg.goal_attr_mode == "dummy":
            return None, None
        valid = jnp.any(agent_valid, axis=1)
        if self.cfg.goal_attr_mode == "dest":
            return gt_dest, valid
        return gt_goal[..., :2], valid

    def pred_goal(self, *args, **kwargs):
        if self.predictor is None:
            return None
        return self.predictor(*args, **kwargs)

    def get_goal_feature(
        self, goal: jnp.ndarray, as_state: jnp.ndarray, map_feature: jnp.ndarray
    ) -> jnp.ndarray:
        """Ref goal_manager.py:83-139. as_state [S, A, 4] (single step)."""
        if self.cfg.goal_attr_mode == "dest":
            if self.cfg.dest_detach_map_feature:
                map_feature = jax.lax.stop_gradient(map_feature)
            return jnp.take_along_axis(map_feature, goal[..., None], axis=1)
        if self.cfg.goal_attr_mode == "goal_xy":
            goal_feature = goal[..., :2]
            if self.cfg.goal_in_local:
                st = jax.lax.stop_gradient(as_state)
                ref_pos = st[..., :2][..., None, :]
                ref_rot = rad2rot(st[..., 2])
                goal_feature = pos2local(goal_feature[..., None, :], ref_pos, ref_rot)[..., 0, :]
            return goal_feature
        raise NotImplementedError(self.cfg.goal_attr_mode)

    def disable_goal_reached(
        self,
        goal_valid: Optional[jnp.ndarray],
        agent_valid: jnp.ndarray,
        dest_reached: jnp.ndarray,
        goal_reached: jnp.ndarray,
    ) -> Optional[jnp.ndarray]:
        """Ref goal_manager.py:141-162. (pure; no params)"""
        if goal_valid is None:
            return None
        goal_valid = goal_valid & agent_valid
        if self.cfg.disable_if_reached:
            if self.cfg.goal_attr_mode == "dest":
                goal_valid = goal_valid & (~dest_reached)
            elif self.cfg.goal_attr_mode == "goal_xy":
                goal_valid = goal_valid & (~goal_reached)
        return goal_valid
