"""Closed-loop 90-step rollout as ONE jitted `lax.scan`.

This is the performance centerpiece of the framework (SURVEY.md section 3.6
and BASELINE.md north star). The reference steps the simulator from Python
(waymo_motion.py:269-352), paying dispatch + kernel-launch overhead 90 times
per batch; here the whole rollout — policy forward, action sampling,
kinematic integration, teacher forcing, rule checking, goal disabling and
reward — is a single fused XLA program with static shapes. Teacher forcing
and closed-loop share one code path: override masks are scan inputs.

Semantics preserved from the reference (hard parts, SURVEY.md section 7):
  - state override happens AFTER the dynamics update (waymo_motion.py:172-178);
  - the traffic-light slice for step t is tl[min(t-1, T_tl-1)]
    (waymo_motion.py:287);
  - kill() spares agents with GT validity at t (dynamics.py:161-163);
  - goal features are regathered per step only when update_goal
    (waymo_motion.py:289-292);
  - StepOutput.valid is the PRE-override validity ("pred_valid",
    waymo_motion.py:186) while the carry continues with post-override state;
  - steps beyond the GT horizon behave as if GT were absent: callers pad GT
    with valid=False (exactly reproduces the `_step >= shape[1]` branch at
    waymo_motion.py:271-310).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.ad_checkpoint import checkpoint_name

from ..config import ExperimentConfig
from ..data.preprocessing import agent_attr_and_pe
from ..distributions import DiagGaussian, DetType
from .dynamics import (
    AgentState,
    DynamicsParams,
    dynamics_update,
    init_agent_state,
    kill,
    override_states,
)
from .rewards import RewardConfig, differentiable_reward
from .rules import RuleConfig, RuleConstants, RuleState, check_rules, init_rule_state


@struct.dataclass
class RolloutCarry:
    agent: AgentState
    rules: RuleState
    hidden: jnp.ndarray  # [L, B, A, d]
    goal_valid: Optional[jnp.ndarray]  # [B, A] or None
    latent_sample: Optional[jnp.ndarray]  # [B, A, latent_dim] or None
    latent_logp: Optional[jnp.ndarray]  # [B, A]
    key: jax.Array


@struct.dataclass
class StepOutput:
    """Scan ys — the RolloutBuffer columns (ref buffer.py:18-37), stacked by
    scan along axis 0 = step."""

    valid: jnp.ndarray  # [B, A] pre-override validity
    pred: jnp.ndarray  # [B, A, 4]
    override_mask: jnp.ndarray  # [B, A]
    violations: Dict[str, jnp.ndarray]
    diffbar_reward: jnp.ndarray  # [B, A]
    diffbar_reward_valid: jnp.ndarray  # [B, A]
    latent_log_prob: jnp.ndarray  # [B, A]
    action_log_prob: jnp.ndarray  # [B, A]
    attn: Optional[Dict[str, jnp.ndarray]] = None  # vis only (collect_attention)


@struct.dataclass
class RolloutOutput:
    """Stacked rollout results, step-major converted to batch-major
    [B, A, n_step, ...] to match the reference buffer layout (buffer.py:72-90)."""

    valid: jnp.ndarray  # [B, A, S]
    preds: jnp.ndarray  # [B, A, S, 4]
    override_masks: jnp.ndarray  # [B, A, S]
    violations: Dict[str, jnp.ndarray]  # each [B, A, S]
    diffbar_rewards: jnp.ndarray  # [B, A, S]
    diffbar_rewards_valid: jnp.ndarray  # [B, A, S]
    latent_log_probs: jnp.ndarray  # [B, A, S]
    action_log_probs: jnp.ndarray  # [B, A, S]
    attn: Optional[Dict[str, jnp.ndarray]] = None  # each [B, A, S, n_tgt]
    step_future_start: int = struct.field(pytree_node=False, default=10)

    def flatten_repeat(self, n_repeat: int) -> "RolloutOutput":
        """[B*K, A, S, ...] -> [B, A, K, S, ...]. Ref buffer.py:92-123."""

        def _fr(x):
            if x.ndim >= 3:
                B, A, S = x.shape[:3]
                rest = x.shape[3:]
                return jnp.swapaxes(x.reshape(B // n_repeat, n_repeat, A, S, *rest), 1, 2)
            return x

        return RolloutOutput(
            valid=_fr(self.valid),
            preds=_fr(self.preds),
            override_masks=_fr(self.override_masks),
            violations={k: _fr(v) for k, v in self.violations.items()},
            diffbar_rewards=_fr(self.diffbar_rewards),
            diffbar_rewards_valid=_fr(self.diffbar_rewards_valid),
            latent_log_probs=_fr(self.latent_log_probs),
            action_log_probs=_fr(self.action_log_probs),
            attn=None if self.attn is None else {k: _fr(v) for k, v in self.attn.items()},
            step_future_start=self.step_future_start,
        )


def pad_gt_features(features: Dict[str, jnp.ndarray], step_end: int) -> Dict[str, jnp.ndarray]:
    """Pad GT arrays along the step axis to step_end+1 with invalid zeros.

    Reproduces the reference's `_step >= features["agent_valid"].shape[1]`
    branches (waymo_motion.py:271-310) with static shapes.
    """
    out = dict(features)
    T = features["agent_valid"].shape[1]
    need = step_end + 1 - T
    if need > 0:
        for k in ("agent_valid", "agent_state", "vel", "acc", "yaw_rate"):
            x = features[k]
            pad = [(0, 0)] * x.ndim
            pad[1] = (0, need)
            out[k] = jnp.pad(x, pad)
    return out


def build_sim(
    cfg: ExperimentConfig,
    model_apply: Callable,  # partial(model.apply, variables) with method kwarg support
    dyn_params: DynamicsParams,
    rule_consts: RuleConstants,
    features: Dict[str, jnp.ndarray],
    latent_dist,  # distribution pytree or None
    goal: Optional[jnp.ndarray],
    goal_valid: Optional[jnp.ndarray],
    mask_teacher_forcing: jnp.ndarray,  # [B, T_gt, A]
    key: jax.Array,
    deterministic_latent: DetType = True,
    deterministic_action: bool = True,
    step_start: int = 1,
    step_end: int = 90,
    training: bool = False,
    gt_sdc: Optional[Dict[str, jnp.ndarray]] = None,
    collect_attention: bool = False,
):
    """Construct the simulation: initial carry, per-step scan inputs and the
    pure step body. `rollout` runs the whole thing as one `lax.scan`;
    `sim/interactive.py` steps the SAME body one step at a time (jitted) for
    mid-rollout intervention — both paths share every line of physics
    (equal up to XLA fusion differences between the two compilations).

    Returns (carry0: RolloutCarry, xs: dict of step-major arrays,
    body: (carry, x) -> (carry, StepOutput)).

    features keys (all batch-major):
      map_valid [B,P], map_feature [B,P,d], tl_valid [B,T_tl,n_tl],
      tl_feature [B,T_tl,n_tl,d], agent_type [B,A,3], agent_size [B,A,3],
      agent_valid [B,T_gt,A], agent_state [B,T_gt,A,4], vel/acc/yaw_rate.
    """
    mcfg = cfg.model
    rcfg = RuleConfig(
        enable_check_collided=cfg.rule_checker.enable_check_collided,
        enable_check_run_road_edge=cfg.rule_checker.enable_check_run_road_edge,
        enable_check_run_red_light=cfg.rule_checker.enable_check_run_red_light,
        enable_check_passive=cfg.rule_checker.enable_check_passive,
        collision_size_scale=cfg.rule_checker.collision_size_scale,
    )
    rew_cfg = RewardConfig(
        w_collision=cfg.reward.w_collision,
        reduce_collision_with_max=cfg.reward.reduce_collision_with_max,
        use_il_loss=cfg.reward.use_il_loss,
        w_pos=cfg.reward.w_pos, criterion_pos=cfg.reward.criterion_pos,
        w_rot=cfg.reward.w_rot, criterion_rot=cfg.reward.criterion_rot,
        angular_type_rot=cfg.reward.angular_type_rot,
        w_spd=cfg.reward.w_spd, criterion_spd=cfg.reward.criterion_spd,
    )

    features = pad_gt_features(features, step_end)
    if gt_sdc is not None:
        gt_sdc = pad_gt_features(gt_sdc, step_end) if "agent_valid" in gt_sdc else gt_sdc

    B, T_gt, A = features["agent_valid"].shape
    T_tf = mask_teacher_forcing.shape[1]
    if T_tf < step_end + 1:
        pad = [(0, 0)] * 3
        pad[1] = (0, step_end + 1 - T_tf)
        mask_teacher_forcing = jnp.pad(mask_teacher_forcing, pad)

    key, k_latent = jax.random.split(key)

    # frame-0 init (ref waymo_motion.py:249-259)
    agent0 = init_agent_state(
        valid=features["agent_valid"][:, 0],
        state=features["agent_state"][:, 0],
        vel=features["vel"][:, 0],
        acc=features["acc"][:, 0],
        yaw_rate=features["yaw_rate"][:, 0],
    )

    # latent: sample once unless resample_latent (ref traffic_bots.py:196-199)
    latent_sample = latent_logp = None
    if latent_dist is not None:
        latent_sample = latent_dist.sample(k_latent, deterministic_latent)
        latent_logp = latent_dist.log_prob(jax.lax.stop_gradient(latent_sample))

    # goal feature (static unless update_goal; ref waymo_motion.py:261-266)
    goal_is_none = goal is None or mcfg.goal_manager.goal_attr_mode == "dummy"
    update_goal = mcfg.goal_manager.goal_attr_mode == "goal_xy" and mcfg.goal_manager.goal_in_local

    def get_goal_feature(agent_state):
        from ..models.goal_manager import GoalManager  # noqa: cycle-free at runtime
        if goal_is_none:
            return None
        if mcfg.goal_manager.goal_attr_mode == "dest":
            mf = features["map_feature"]
            if mcfg.goal_manager.dest_detach_map_feature:
                mf = jax.lax.stop_gradient(mf)
            return jnp.take_along_axis(mf, goal[..., None], axis=1)
        # goal_xy
        from ..geometry import pos2local, rad2rot
        gf = goal[..., :2]
        if mcfg.goal_manager.goal_in_local:
            st = jax.lax.stop_gradient(agent_state)
            gf = pos2local(gf[..., None, :], st[..., :2][..., None, :], rad2rot(st[..., 2]))[..., 0, :]
        return gf

    goal_feature_static = None if update_goal else get_goal_feature(agent0.state)

    # K/V cache for the as2pl cross-attention: the map tokens are identical at
    # every rollout step, so their per-layer K/V projections are computed ONCE
    # here instead of 90x inside the scan (the heaviest per-step matmuls:
    # n_pl=1024 tokens vs n_agent=64 queries).
    map_kv = model_apply(
        method="precompute_map_kv", map_feature=features["map_feature"],
        allow_bf16=not training,  # training keeps the reference's fp32 K/V
    )

    # goal/latent injection input MLPs hoisted out of the scan (eval only —
    # in training their dropout must stay per-step). The z-inputs are
    # step-invariant; the validity masks below are supersets of every
    # per-step mask (goal_valid only shrinks, agent validity is bounded by
    # ever-valid | frame-0), and invalid rows are re-masked downstream in
    # AddLatentGoal, so the hoist is exact.
    goal_z_pre = latent_z_pre = None
    if not training and not update_goal and not mcfg.resample_latent:
        ever_valid = jnp.any(features["agent_valid"], axis=1) | agent0.valid
        goal_z_pre, latent_z_pre = model_apply(
            method="precompute_add_feats",
            goal_feature=goal_feature_static,
            goal_valid=goal_valid,
            latent_sample=latent_sample,
            latent_valid=ever_valid,
        )

    hidden0 = jnp.zeros((mcfg.agent_temporal.num_layers, B, A, mcfg.hidden_dim))
    carry0 = RolloutCarry(
        agent=agent0,
        rules=init_rule_state(B, A),
        hidden=hidden0,
        goal_valid=goal_valid,
        latent_sample=latent_sample,
        latent_logp=latent_logp,
        key=key,
    )

    T_tl = features["tl_valid"].shape[1]
    steps = jnp.arange(step_start, step_end + 1)

    # step-major traffic-light views, indexed with clipped step inside the body
    tl_valid_sm = jnp.moveaxis(features["tl_valid"], 1, 0)  # [T_tl, B, n_tl]
    tl_feature_sm = jnp.moveaxis(features["tl_feature"], 1, 0)
    # raw tl_stop slices for the rule checker (only materialized if checks need them)
    need_tl_rules = rcfg.enable_check_run_red_light or rcfg.enable_check_passive
    if need_tl_rules:
        tl_stop_valid_sm = jnp.moveaxis(features["tl_stop_valid"], 1, 0)
        tl_stop_pos_sm = jnp.moveaxis(features["tl_stop_pos"], 1, 0)
        tl_stop_state_sm = jnp.moveaxis(features["tl_stop_state"], 1, 0)
        T_tls = tl_stop_valid_sm.shape[0]
    else:
        n_tl = features["tl_valid"].shape[2]
        tl_stop_valid_sm = jnp.zeros((1, B, n_tl), dtype=bool)
        tl_stop_pos_sm = jnp.zeros((1, B, n_tl, 2))
        tl_stop_state_sm = jnp.zeros((1, B, n_tl, 5), dtype=bool)
        T_tls = 1

    # scan xs: per-step GT + override masks (step-major)
    xs = {
        "step": steps,
        "tf_mask": jnp.moveaxis(mask_teacher_forcing[:, step_start : step_end + 1], 1, 0),
        "gt_valid": jnp.moveaxis(features["agent_valid"][:, step_start : step_end + 1], 1, 0),
        "gt_state": jnp.moveaxis(features["agent_state"][:, step_start : step_end + 1], 1, 0),
        "gt_vel": jnp.moveaxis(features["vel"][:, step_start : step_end + 1], 1, 0),
        "gt_acc": jnp.moveaxis(features["acc"][:, step_start : step_end + 1], 1, 0),
        "gt_yaw_rate": jnp.moveaxis(features["yaw_rate"][:, step_start : step_end + 1], 1, 0),
    }
    if gt_sdc is not None:
        xs["sdc_state"] = jnp.moveaxis(gt_sdc["agent_state"][:, step_start : step_end + 1], 1, 0)
        xs["sdc_vel"] = jnp.moveaxis(gt_sdc["vel"][:, step_start : step_end + 1], 1, 0)
        xs["sdc_acc"] = jnp.moveaxis(gt_sdc["acc"][:, step_start : step_end + 1], 1, 0)
        xs["sdc_yaw_rate"] = jnp.moveaxis(gt_sdc["yaw_rate"][:, step_start : step_end + 1], 1, 0)

    # per-step PRNG is only consumed when something is stochastic; in the
    # fully-deterministic eval rollout the 5-way split x90 steps is ~450
    # dead threefry ops — skip it (static decision, compiled away)
    # (the episode latent is sampled BEFORE the scan; in-body consumers are
    # action sampling, dropout, hidden-drop, and per-step latent resampling)
    need_step_rng = training or not deterministic_action or mcfg.resample_latent

    def body(carry: RolloutCarry, x) -> Tuple[RolloutCarry, StepOutput]:
        step = x["step"]
        agent = carry.agent
        key = carry.key
        if need_step_rng:
            key, k_action, k_dropout, k_drop_hidden, k_resample = jax.random.split(key, 5)
        else:
            k_action = k_dropout = k_drop_hidden = k_resample = key

        # teacher forcing inputs for this step
        mask_override = x["tf_mask"]
        state_override = {
            "state": x["gt_state"], "vel": x["gt_vel"],
            "acc": x["gt_acc"], "yaw_rate": x["gt_yaw_rate"],
        }
        if gt_sdc is not None:
            # what-if: force agent 0 to the provided SDC trajectory
            mask_override = mask_override.at[:, 0].set(True)
            for k_src, k_dst in (
                ("sdc_state", "state"), ("sdc_vel", "vel"),
                ("sdc_acc", "acc"), ("sdc_yaw_rate", "yaw_rate"),
            ):
                state_override[k_dst] = state_override[k_dst].at[:, 0].set(x[k_src][:, 0])

        # traffic lights: last observed state (ref waymo_motion.py:287)
        tl_idx = jnp.clip(step - 1, 0, T_tl - 1)
        tl_valid_t = jax.lax.dynamic_index_in_dim(tl_valid_sm, tl_idx, axis=0, keepdims=False)
        tl_feature_t = jax.lax.dynamic_index_in_dim(tl_feature_sm, tl_idx, axis=0, keepdims=False)

        # re-sample latent per step (TrafficSim; ref traffic_bots.py:196-199)
        latent_sample = carry.latent_sample
        latent_logp = carry.latent_logp
        if mcfg.resample_latent and latent_dist is not None:
            latent_sample = latent_dist.sample(k_resample, deterministic_latent)
            latent_logp = latent_dist.log_prob(jax.lax.stop_gradient(latent_sample))

        # goal feature (ref waymo_motion.py:289-292)
        goal_feature = get_goal_feature(agent.state) if update_goal else goal_feature_static

        # featurize current state (ref waymo_motion.py:140-149)
        attr, pe = agent_attr_and_pe(
            mcfg,
            agent_pos=agent.state[..., :2],
            agent_yaw_bbox=agent.state[..., 2:3],
            agent_vel=agent.vel,
            agent_spd=agent.state[..., 3:4],
            agent_yaw_rate=agent.yaw_rate,
            agent_acc=agent.acc,
            agent_size=features["agent_size"],
            agent_type=features["agent_type"],
        )
        if cfg.detach_state_policy:
            attr = jax.lax.stop_gradient(attr)
            pe = jax.lax.stop_gradient(pe)

        rngs = {"dropout": k_dropout} if training else {}
        agent_feature = model_apply(
            method="encode_agent", valid=agent.valid, attr=attr, pe=pe,
            deterministic=not training, rngs=rngs,
        )
        # remat tag: under remat_policy="save_core" the scan saves the
        # per-step featurization so its backward re-forward skips it
        agent_feature = checkpoint_name(agent_feature, "step_feat")
        action_mean, action_log_std, hidden, _, attn = model_apply(
            method="policy_step",
            agent_valid=agent.valid,
            agent_feature=agent_feature,
            map_valid=features["map_valid"],
            map_feature=features["map_feature"],
            map_kv=map_kv,
            tl_valid=tl_valid_t,
            tl_feature=tl_feature_t,
            goal_valid=carry.goal_valid,
            goal_feature=goal_feature,
            latent_sample=latent_sample,
            hidden=carry.hidden,
            agent_type=features["agent_type"],
            need_weights=collect_attention,
            deterministic=not training,
            goal_z_pre=goal_z_pre,
            latent_z_pre=latent_z_pre,
            rngs=rngs,
        )

        action_dist = DiagGaussian(mean=action_mean, log_std=action_log_std)
        new_agent, action, action_logp = dynamics_update(
            dyn_params, agent, features["agent_type"], action_dist,
            k_action, deterministic=deterministic_action,
        )
        pred_valid = new_agent.valid  # pre-override (ref waymo_motion.py:186)
        pred_state = new_agent.state
        new_agent = override_states(new_agent, state_override, mask_override)

        # rules + kill + goal disable (ref waymo_motion.py:308-318)
        # rule checker uses tl[min(step, T-1)] (ref traffic_rule_checker.py:442)
        tls_idx = jnp.clip(step, 0, T_tls - 1)
        new_rules, violations = check_rules(
            rcfg, rule_consts, carry.rules, new_agent.valid, new_agent.state,
            jax.lax.dynamic_index_in_dim(tl_stop_valid_sm, tls_idx, axis=0, keepdims=False),
            jax.lax.dynamic_index_in_dim(tl_stop_pos_sm, tls_idx, axis=0, keepdims=False),
            jax.lax.dynamic_index_in_dim(tl_stop_state_sm, tls_idx, axis=0, keepdims=False),
        )
        new_agent = kill(new_agent, violations["outside_map_this_step"], x["gt_valid"])

        new_goal_valid = carry.goal_valid
        if new_goal_valid is not None:
            new_goal_valid = new_goal_valid & new_agent.valid
            if mcfg.goal_manager.disable_if_reached:
                if mcfg.goal_manager.goal_attr_mode == "dest":
                    new_goal_valid = new_goal_valid & (~violations["dest_reached"])
                elif mcfg.goal_manager.goal_attr_mode == "goal_xy":
                    new_goal_valid = new_goal_valid & (~violations["goal_reached"])

        # diffbar reward (ref waymo_motion.py:320-328)
        reward, reward_valid = differentiable_reward(
            rew_cfg, pred_valid, pred_state, x["gt_valid"], x["gt_state"],
            features["agent_size"],
        )

        # hidden detach / dropout (ref waymo_motion.py:346-351)
        if training and cfg.step_detach_hidden >= 0:
            hidden = jnp.where(
                step <= cfg.step_detach_hidden, jax.lax.stop_gradient(hidden), hidden
            )
        if training and cfg.p_drop_hidden > 0:
            drop = jax.random.uniform(k_drop_hidden, ()) < cfg.p_drop_hidden
            hidden = jnp.where(drop, jnp.zeros_like(hidden), hidden)

        out = StepOutput(
            valid=pred_valid,
            pred=pred_state,
            override_mask=mask_override,
            violations=violations,
            diffbar_reward=reward,
            diffbar_reward_valid=reward_valid,
            latent_log_prob=latent_logp if latent_logp is not None else jnp.zeros_like(action_logp),
            action_log_prob=action_logp,
            attn={k: v for k, v in attn.items() if v is not None} if collect_attention else None,
        )
        new_carry = RolloutCarry(
            agent=new_agent, rules=new_rules, hidden=hidden,
            goal_valid=new_goal_valid,
            latent_sample=latent_sample, latent_logp=latent_logp, key=key,
        )
        return new_carry, out

    return carry0, xs, body


def rollout(
    cfg: ExperimentConfig,
    model_apply: Callable,
    dyn_params: DynamicsParams,
    rule_consts: RuleConstants,
    features: Dict[str, jnp.ndarray],
    latent_dist,
    goal: Optional[jnp.ndarray],
    goal_valid: Optional[jnp.ndarray],
    mask_teacher_forcing: jnp.ndarray,
    key: jax.Array,
    deterministic_latent: DetType = True,
    deterministic_action: bool = True,
    step_start: int = 1,
    step_end: int = 90,
    training: bool = False,
    gt_sdc: Optional[Dict[str, jnp.ndarray]] = None,
    collect_attention: bool = False,
) -> RolloutOutput:
    """Run the closed-loop simulation as one `lax.scan`.
    Ref waymo_motion.py:205-354; see `build_sim` for the features contract.
    """
    carry0, xs, body = build_sim(
        cfg, model_apply, dyn_params, rule_consts, features, latent_dist,
        goal, goal_valid, mask_teacher_forcing, key,
        deterministic_latent=deterministic_latent,
        deterministic_action=deterministic_action,
        step_start=step_start, step_end=step_end, training=training,
        gt_sdc=gt_sdc, collect_attention=collect_attention,
    )

    if training and cfg.remat_rollout_step:
        # Rematerialize the policy step in the backward pass: BPTT over 90
        # steps keeps O(carry) memory instead of O(steps x activations)
        # (SURVEY.md hard part #2), trading ~1 extra forward for the ability
        # to scale batch per chip. remat_policy="save_attn" keeps each
        # attention core's output as a residual so the re-forward skips the
        # attention kernels (their custom VJP recomputes in-VMEM anyway).
        if cfg.remat_policy == "save_attn":
            policy = jax.checkpoint_policies.save_only_these_names("attn_core")
            body = jax.checkpoint(body, prevent_cse=False, policy=policy)
        elif cfg.remat_policy == "save_core":
            # additionally save the per-step featurization, the GRU output
            # and the action-head input (~3 MB/step at batch 32) so the
            # backward re-forward skips everything but the cheap glue
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_core", "step_feat", "gru_core", "policy_feat"
            )
            body = jax.checkpoint(body, prevent_cse=False, policy=policy)
        else:
            body = jax.checkpoint(body, prevent_cse=False)
    _, ys = jax.lax.scan(body, carry0, xs)

    def to_batch_major(x):
        # [S, B, A, ...] -> [B, A, S, ...]
        return jnp.moveaxis(x, 0, 2)

    return RolloutOutput(
        valid=to_batch_major(ys.valid),
        preds=to_batch_major(ys.pred),
        override_masks=to_batch_major(ys.override_mask),
        violations={k: to_batch_major(v) for k, v in ys.violations.items()},
        diffbar_rewards=to_batch_major(ys.diffbar_reward),
        diffbar_rewards_valid=to_batch_major(ys.diffbar_reward_valid),
        latent_log_probs=to_batch_major(ys.latent_log_prob),
        action_log_probs=to_batch_major(ys.action_log_prob),
        attn=None if ys.attn is None else {k: to_batch_major(v) for k, v in ys.attn.items()},
        step_future_start=cfg.time_step_current + 1 - step_start,
    )


