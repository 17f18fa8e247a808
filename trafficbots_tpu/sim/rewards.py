"""Differentiable reward (negative imitation loss + optional collision penalty).

Pure-function port of /root/reference/src/utils/rewards.py (gradients flow
through the rollout states into this reward at every step — it is the main
training signal) and the angular-error primitives of
/root/reference/src/models/metrics/loss.py:9-33.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..geometry import cast_rad


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise SmoothL1Loss (torch semantics, beta=1)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred - target
    return d * d


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


_CRITERIA = {"SmoothL1Loss": smooth_l1, "MSELoss": mse, "L1Loss": l1}


def angular_error(
    preds: jnp.ndarray, target: jnp.ndarray, angular_type: Optional[str], criterion: str = "SmoothL1Loss"
) -> jnp.ndarray:
    """Ref: loss.py:16-33 (cast / cosine / vector / plain)."""
    crit = _CRITERIA[criterion]
    if angular_type is None:
        return crit(preds, target)
    if angular_type == "cast":
        diff = cast_rad(preds - target)
        return crit(diff, jnp.zeros_like(diff))
    if angular_type == "cosine":
        return 0.5 * (1.0 - jnp.cos(preds - target))
    if angular_type == "vector":
        return crit(jnp.cos(preds), jnp.cos(target)) + crit(jnp.sin(preds), jnp.sin(target))
    raise NotImplementedError(angular_type)


@struct.dataclass
class RewardConfig:
    """Defaults per configs/model/traffic_bots.yaml:157-172."""

    w_collision: float = struct.field(pytree_node=False, default=0.0)
    reduce_collision_with_max: bool = struct.field(pytree_node=False, default=True)
    use_il_loss: bool = struct.field(pytree_node=False, default=True)
    w_pos: float = struct.field(pytree_node=False, default=1e-1)
    criterion_pos: str = struct.field(pytree_node=False, default="SmoothL1Loss")
    w_rot: float = struct.field(pytree_node=False, default=1e1)
    criterion_rot: str = struct.field(pytree_node=False, default="SmoothL1Loss")
    angular_type_rot: str = struct.field(pytree_node=False, default="cosine")
    w_spd: float = struct.field(pytree_node=False, default=1e-1)
    criterion_spd: str = struct.field(pytree_node=False, default="SmoothL1Loss")


def _collision_penalty(
    agent_valid: jnp.ndarray, agent_state: jnp.ndarray, agent_size: jnp.ndarray, reduce_with_max: bool
) -> jnp.ndarray:
    """5-circle pairwise soft collision. Ref: rewards.py:49-115.

    agent_valid [n,a]; agent_state [n,a,4]; agent_size [n,a,3].
    """
    eps = jnp.finfo(agent_state.dtype).eps
    n_agent = agent_valid.shape[1]
    agent_xy = agent_state[..., :2]
    yaw = agent_state[..., 2]
    heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)  # [n,a,2]

    agent_w = jnp.min(agent_size[:, :, :2], axis=-1)
    agent_l = jnp.max(agent_size[:, :, :2], axis=-1)
    agent_d = ((agent_l - agent_w) / 4.0)[..., None]  # [n,a,1]

    # [n, a, 5, 2] circle centroids along the heading axis
    offsets = jnp.arange(-2.0, 3.0)[None, None, :, None]
    centroids = agent_xy[:, :, None, :] + offsets * (heading * agent_d)[:, :, None, :]

    # pairwise min distance over the 5x5 circle pairs
    # [n, a, 1, 5, 1, 2] - [n, 1, a, 1, 5, 2]
    diff = centroids[:, :, None, :, None, :] - centroids[:, None, :, None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1) + eps  # [n, a, a, 5, 5]
    dist = jnp.min(dist.reshape(*dist.shape[:3], 25), axis=-1)  # [n, a, a]

    agent_r = agent_w[:, :, None] / 2.0 + eps  # [n, a, 1]
    r_sum = jnp.swapaxes(jnp.broadcast_to(agent_r, dist.shape), 1, 2) + agent_r

    collision = jnp.clip(1.0 - dist / r_sum, min=0.0)
    ego_mask = jnp.eye(n_agent, dtype=bool)[None]
    invalid = ego_mask | (~agent_valid[:, :, None]) | (~agent_valid[:, None, :])
    collision = jnp.where(invalid, 0.0, collision)

    if reduce_with_max:
        collision = jnp.max(collision, axis=2)
    else:
        collision = jnp.clip(collision, max=1.0)
        collision = jnp.sum(collision, axis=-1) / jnp.sum(agent_valid, axis=-1, keepdims=True)
    return jnp.where(agent_valid, collision, 0.0)


def differentiable_reward(
    cfg: RewardConfig,
    agent_valid: jnp.ndarray,  # [n, a] bool
    agent_state: jnp.ndarray,  # [n, a, 4]
    gt_valid: Optional[jnp.ndarray],  # [n, a] bool
    gt_state: Optional[jnp.ndarray],  # [n, a, 4]
    agent_size: jnp.ndarray,  # [n, a, 3]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-step reward and its validity. Ref: rewards.py:33-131."""
    reward = jnp.zeros_like(agent_state[:, :, 0])
    reward_valid = agent_valid

    if cfg.w_collision > 0:
        collision = _collision_penalty(
            agent_valid, agent_state, agent_size, cfg.reduce_collision_with_max
        )
        reward = reward - cfg.w_collision * collision

    if cfg.use_il_loss and gt_valid is not None:
        il_valid = agent_valid & gt_valid
        inv = ~il_valid[..., None]
        gt = jnp.where(inv, 0.0, gt_state)
        pred = jnp.where(inv, 0.0, agent_state)

        error_pos = jnp.sum(
            _CRITERIA[cfg.criterion_pos](gt[..., :2], pred[..., :2]), axis=-1
        )
        error_rot = angular_error(gt[..., 2], pred[..., 2], cfg.angular_type_rot, cfg.criterion_rot)
        error_spd = _CRITERIA[cfg.criterion_spd](gt[..., 3], pred[..., 3])
        il_loss = cfg.w_pos * error_pos + cfg.w_rot * error_rot + cfg.w_spd * error_spd
        reward = reward - il_loss
        reward_valid = il_valid

    return jnp.where(reward_valid, reward, 0.0), reward_valid
