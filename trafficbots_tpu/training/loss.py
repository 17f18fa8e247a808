"""Training loss assembly: balanced KL + diffbar reward + goal NLL.

Pure-function port of /root/reference/src/models/metrics/training.py:61-158
and the BalancedKL primitive (loss.py:36-74). The reference accumulates
sums/counters in torchmetrics state and divides in compute(); here one pure
function maps a rollout to (loss, metrics dict of (sum, count)) so the same
code path serves jitted training and psum-reduced distributed logging.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TrainingMetricsConfig
from ..distributions import (
    DiagGaussian,
    DummyLatent,
    MultiCategorical,
    kl_diag_gaussian,
    kl_multi_categorical,
)


def _kl(post, prior) -> jnp.ndarray:
    if isinstance(post, DummyLatent):
        return jnp.zeros_like(post.zeros[..., 0])
    if isinstance(post, MultiCategorical):
        return kl_multi_categorical(post, prior)
    return kl_diag_gaussian(post, prior)


def _kl_detached(post, prior, detach_post: bool) -> jnp.ndarray:
    sg = jax.lax.stop_gradient
    if isinstance(post, MultiCategorical):
        if detach_post:
            return kl_multi_categorical(MultiCategorical(sg(post.probs)), prior)
        return kl_multi_categorical(post, MultiCategorical(sg(prior.probs)))
    if detach_post:
        return kl_diag_gaussian(DiagGaussian(sg(post.mean), sg(post.log_std)), prior)
    return kl_diag_gaussian(post, DiagGaussian(sg(prior.mean), sg(prior.log_std)))


def balanced_kl(post, prior, alpha: float, free_nats: float) -> jnp.ndarray:
    """Dreamer-style two-sided KL with free nats. Ref loss.py:45-74."""
    if alpha > 0:
        e0 = _kl_detached(post, prior, detach_post=True)  # trains the prior
        e1 = _kl_detached(post, prior, detach_post=False)  # trains the posterior
        if free_nats > 0:
            e0 = jnp.maximum(e0, free_nats)
            e1 = jnp.maximum(e1, free_nats)
        return alpha * e0 + (1.0 - alpha) * e1
    err = _kl(post, prior)
    if free_nats > 0:
        err = jnp.maximum(err, free_nats)
    return err


def training_loss(
    cfg: TrainingMetricsConfig,
    pred_valid: jnp.ndarray,  # [B, A, S]
    diffbar_rewards_valid: jnp.ndarray,  # [B, A, S]
    diffbar_rewards: jnp.ndarray,  # [B, A, S]
    override_masks: jnp.ndarray,  # [B, A, S]
    agent_role: jnp.ndarray,  # [B, A, 3]
    goal_valid: Optional[jnp.ndarray],  # [B, A]
    goal_pred,  # DestCategorical | DiagGaussian | None
    goal_gt: Optional[jnp.ndarray],
    latent_post,
    latent_prior,
    step_start: int = 1,
    irrelevant_key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Ref training.py:61-158. Returns (scalar loss, metrics sums/counters).

    `pred_valid` etc. are the rollout buffer columns, step axis starting at
    absolute step `step_start` (the reference masks steps < step_training_start).
    """
    metrics: Dict[str, jnp.ndarray] = {}

    pv = pred_valid
    if cfg.p_loss_for_irrelevant > 0:
        assert irrelevant_key is not None
        mask_rel = jnp.any(agent_role, axis=-1)[..., None]
        pv = pv & mask_rel
        mask_irr = jax.random.bernoulli(
            irrelevant_key, cfg.p_loss_for_irrelevant, mask_rel.shape
        )
        pv = pv | mask_irr
    if not cfg.loss_for_teacher_forcing:
        pv = pv & (~override_masks)
    if cfg.step_training_start > 0:
        n_skip = max(0, cfg.step_training_start - step_start + 1)
        step_idx = jnp.arange(pv.shape[-1])
        pv = pv & (step_idx >= n_skip)[None, None, :]
    pv = jax.lax.stop_gradient(pv)

    if cfg.w_relevant_agent > 0:
        w_rel = jnp.any(pv, axis=-1) + jnp.any(agent_role, axis=-1) * cfg.w_relevant_agent
        w_rel = jax.lax.stop_gradient(w_rel.astype(jnp.float32))
    else:
        w_rel = None

    loss = jnp.float32(0.0)

    # ---- CVAE KL (ref training.py:101-115)
    if cfg.w_vae_kl > 0 and latent_post is not None and not isinstance(latent_post, DummyLatent):
        kl_valid = latent_post.valid if cfg.kl_for_unseen_agent else latent_prior.valid
        kl_valid = kl_valid & jnp.any(pv, axis=-1)
        err = balanced_kl(latent_post, latent_prior, cfg.kl_balance_scale, cfg.kl_free_nats)
        if w_rel is not None:
            err = err * w_rel
        kl_sum = jnp.sum(jnp.where(kl_valid, err, 0.0))
        kl_count = jnp.sum(kl_valid).astype(jnp.float32)
        metrics["vae_kl_sum"] = kl_sum
        metrics["vae_kl_count"] = kl_count
        loss = loss + cfg.w_vae_kl * kl_sum / jnp.maximum(kl_count, 1.0)

    # ---- diffbar reward (ref training.py:117-125)
    if cfg.w_diffbar_reward > 0:
        rv = pv & diffbar_rewards_valid
        err = jnp.where(rv, diffbar_rewards, 0.0)
        if w_rel is not None:
            err = err * w_rel[..., None]
        r_sum = -jnp.sum(err)
        r_count = jnp.sum(rv).astype(jnp.float32)
        metrics["diffbar_reward_sum"] = r_sum
        metrics["diffbar_reward_count"] = r_count
        loss = loss + cfg.w_diffbar_reward * r_sum / jnp.maximum(r_count, 1.0)

    # ---- goal NLL (ref training.py:127-136)
    if cfg.w_goal > 0 and goal_pred is not None:
        gv = goal_pred.valid & jnp.any(pv, axis=-1)
        nll = -goal_pred.log_prob(goal_gt)
        nll = jnp.where(gv, nll, 0.0)
        if w_rel is not None:
            nll = nll * w_rel
        g_sum = jnp.sum(nll)
        g_count = jnp.sum(gv).astype(jnp.float32)
        metrics["goal_loss_sum"] = g_sum
        metrics["goal_loss_count"] = g_count
        loss = loss + cfg.w_goal * g_sum / jnp.maximum(g_count, 1.0)

    metrics["loss"] = loss
    return loss, metrics
