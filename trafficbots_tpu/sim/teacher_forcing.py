"""Teacher-forcing override masks, built once per rollout (not per step).

Pure-function port of the semantics of /root/reference/src/utils/teacher_forcing.py.
The output is a [n_batch, n_step, n_agent] bool mask consumed as scan xs by the
closed-loop rollout, so teacher forcing, warm starts and agent spawning are
plain masked selects inside the scan — no per-step Python branching.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TeacherForcingConfig:
    """Ref: teacher_forcing.py:6-30 + configs/model/traffic_bots.yaml:127-133."""

    step_spawn_agent: int = struct.field(pytree_node=False, default=10)
    step_warm_start: int = struct.field(pytree_node=False, default=10)
    step_horizon: int = struct.field(pytree_node=False, default=0)
    step_horizon_decrease_per_epoch: int = struct.field(pytree_node=False, default=0)
    prob_forcing_agent: float = struct.field(pytree_node=False, default=0.0)
    prob_forcing_agent_decrease_per_epoch: float = struct.field(pytree_node=False, default=0.0)
    # what-if prediction: SDC (agent 0) forced to GT every step
    # (ref teacher_forcing.py:69-72)
    gt_sdc: bool = struct.field(pytree_node=False, default=False)


# standard eval configs, ref configs/model/traffic_bots.yaml:232-238
TF_TRAINING = TeacherForcingConfig()
TF_REACTIVE_REPLAY = TeacherForcingConfig(step_spawn_agent=90, step_warm_start=10)
TF_JOINT_FUTURE_PRED = TeacherForcingConfig(step_spawn_agent=10, step_warm_start=10)


def teacher_forcing_mask(
    cfg: TeacherForcingConfig,
    as_valid: jnp.ndarray,  # [n_batch, n_step, n_agent] bool (GT validity)
    current_epoch: int = 0,
    key: Optional[jax.Array] = None,
    gt_sdc: bool = False,
) -> jnp.ndarray:
    """Build the override mask. Ref: teacher_forcing.py:32-74.

    Rules (all masked by GT validity):
      - step 0 always forced;
      - spawn on valid rising edges up to step_spawn_agent;
      - warm start: all steps <= step_warm_start;
      - epoch-scheduled full-horizon forcing;
      - per-agent Bernoulli forcing (needs `key` when prob > 0);
      - gt_sdc: force agent 0 at every step (what-if prediction).
    """
    n_step = as_valid.shape[1]
    step_idx = jnp.arange(n_step)[None, :, None]  # [1, n_step, 1]

    mask = jnp.zeros_like(as_valid)
    # always spawn at step 0
    mask = mask.at[:, 0].set(as_valid[:, 0])

    if cfg.step_spawn_agent > 0:
        # spawn when valid flips False->True (trajs are gap-interpolated)
        rising = (~as_valid[:, :-1]) & as_valid[:, 1:]
        rising = rising & (jnp.arange(1, n_step)[None, :, None] <= cfg.step_spawn_agent)
        mask = mask.at[:, 1:].set(mask[:, 1:] | rising)

    if cfg.step_warm_start >= 0:
        mask = mask | (as_valid & (step_idx <= cfg.step_warm_start))

    # epoch-dependent schedules: `current_epoch` may be a traced scalar (the
    # train step passes it as a device value so resuming at epoch k does not
    # recompile); the config fields stay static, so the branches below are
    # resolved at trace time while the *amounts* are computed on device.
    # step_idx >= 0, so `step_idx < h` is all-False once h <= 0 — no extra
    # guard needed when the schedule decays past zero.
    if cfg.step_horizon > 0:
        step_horizon = cfg.step_horizon - cfg.step_horizon_decrease_per_epoch * current_epoch
        mask = mask | (as_valid & (step_idx < step_horizon))

    if cfg.prob_forcing_agent > 0:
        assert key is not None, "prob_forcing_agent > 0 requires a PRNG key"
        prob = jnp.clip(
            cfg.prob_forcing_agent - cfg.prob_forcing_agent_decrease_per_epoch * current_epoch,
            0.0, 1.0,
        )
        forced_agent = jax.random.bernoulli(key, prob, as_valid[:, 0].shape)
        mask = mask | (forced_agent[:, None, :] & as_valid)

    if gt_sdc or cfg.gt_sdc:
        mask = mask.at[:, :, 0].set(mask[:, :, 0] | as_valid[:, :, 0])

    return mask
