"""Simulation-quality metrics as pure (sums, counters) reductions.

Port of /root/reference/src/models/metrics/logging.py (ErrorMetrics,
TrafficRuleMetrics). The torchmetrics accumulate-and-sync pattern becomes:
each batch maps to a dict of scalar sums/counters; across devices the dict is
`psum`-reduced (parallel/mesh.py); across batches the host adds dicts.
`compute_*` divides at the end — identical math to the reference's
Metric.compute() after DDP sync.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..geometry import cast_rad


def error_metrics_update(
    pred_valid: jnp.ndarray,  # [B, A, (K), S]
    pred_states: jnp.ndarray,  # [B, A, (K), S, 4]
    gt_valid: jnp.ndarray,  # [B, A, S]
    gt_states: jnp.ndarray,  # [B, A, S, 4]
    override_masks: jnp.ndarray,  # [B, A, (K), S]
    agent_role: jnp.ndarray,  # [B, A, 3]
    loss_for_teacher_forcing: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Ref logging.py:20-55. Returns scalar sums/counters."""
    if pred_valid.ndim == 3:  # add a K axis
        pred_valid = pred_valid[:, :, None]
        pred_states = pred_states[:, :, None]
        override_masks = override_masks[:, :, None]

    mask_rel = jnp.any(agent_role, axis=-1)[:, :, None, None]
    gt_valid = gt_valid[:, :, None]
    gt_states = gt_states[:, :, None]

    pv = pred_valid & mask_rel
    if not loss_for_teacher_forcing:
        pv = pv & (~override_masks)
    err_valid = gt_valid & pv

    gt = jnp.where(err_valid[..., None], gt_states, 0.0)
    pr = jnp.where(err_valid[..., None], pred_states, 0.0)

    return {
        "err_counter": jnp.sum(err_valid).astype(jnp.float32),
        "err_pos_meter": jnp.sum(jnp.linalg.norm(gt[..., :2] - pr[..., :2], axis=-1)),
        "err_rot_deg": jnp.sum(jnp.abs(jnp.rad2deg(cast_rad(gt[..., 2] - pr[..., 2])))),
        "err_spd_m_per_s": jnp.sum(jnp.abs(gt[..., 3] - pr[..., 3])),
    }


def error_metrics_compute(sums: Dict[str, jnp.ndarray], prefix: str = "") -> Dict[str, float]:
    if not sums:  # no batches accumulated (e.g. val disabled)
        return {}
    c = max(float(sums["err_counter"]), 1.0)
    return {
        f"{prefix}err/pos_meter": float(sums["err_pos_meter"]) / c,
        f"{prefix}err/rot_deg": float(sums["err_rot_deg"]) / c,
        f"{prefix}err/spd_m_per_s": float(sums["err_spd_m_per_s"]) / c,
    }


_RULE_KEYS = (
    "outside_map", "collided", "run_road_edge", "run_red_light",
    "passive", "goal_reached", "dest_reached",
)


def rule_metrics_update(
    valid: jnp.ndarray,  # [B, A, (K), S]
    override_masks: jnp.ndarray,
    violations: Dict[str, jnp.ndarray],  # sticky flags, each [B, A, (K), S]
    agent_type: jnp.ndarray,  # [B, A, 3]
    loss_for_teacher_forcing: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Ref logging.py:88-128. Per-agent any-step violation counts."""
    if valid.ndim == 3:
        valid = valid[:, :, None]
        override_masks = override_masks[:, :, None]
        violations = {k: violations[k][:, :, None] for k in _RULE_KEYS}
    else:
        violations = {k: violations[k] for k in _RULE_KEYS}

    if loss_for_teacher_forcing:
        agent_valid = jnp.any(valid, axis=-1)
    else:
        av = valid & (~override_masks)
        violations = {k: v & av for k, v in violations.items()}
        agent_valid = jnp.any(av, axis=-1)

    mask_veh = agent_type[:, :, 0:1]
    out = {
        "counter_agent": jnp.sum(agent_valid).astype(jnp.float32),
        "counter_veh": jnp.sum(agent_valid & mask_veh).astype(jnp.float32),
    }
    for k, v in violations.items():
        out[k] = jnp.sum(jnp.any(v, axis=-1)).astype(jnp.float32)
    return out


def rule_metrics_compute(sums: Dict[str, jnp.ndarray], prefix: str = "") -> Dict[str, float]:
    if not sums:  # no batches accumulated (e.g. val disabled)
        return {}
    ca = max(float(sums["counter_agent"]), 1.0)
    cv = max(float(sums["counter_veh"]), 1.0)
    per_veh = {"run_road_edge", "run_red_light", "passive"}
    return {
        f"{prefix}traffic_rule/{k}": float(sums[k]) / (cv if k in per_veh else ca)
        for k in _RULE_KEYS
    }


def add_metric_sums(a: Dict[str, jnp.ndarray], b: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    if not a:
        return dict(b)
    return {k: a[k] + b[k] for k in b}
