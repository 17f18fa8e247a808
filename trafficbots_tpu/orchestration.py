"""Episode-level orchestration: encode, reactive replay, joint future pred, train.

TPU-native redesign of /root/reference/src/pl_modules/waymo_motion.py. The
LightningModule's stateful plumbing becomes pure functions over (params,
batch, key); the 90-step loop is sim.rollout's lax.scan; K=6 futures fold
into the batch axis via the distributions' pure `repeat` (the reference's
in-place repeat_interleave_, waymo_motion.py:489-514).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import ExperimentConfig
from .data.preprocessing import extract, pre_processing
from .distributions import DestCategorical
from .geometry import pose_pe
from .models.traffic_bots import TrafficBots
from .sim import rules as RU
from .sim.dynamics import make_dynamics_params
from .sim.rollout import RolloutOutput, rollout
from .sim.teacher_forcing import TeacherForcingConfig, teacher_forcing_mask
from .training.loss import training_loss

Batch = Dict[str, jnp.ndarray]


def make_model(cfg: ExperimentConfig) -> TrafficBots:
    compute_dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    return TrafficBots(cfg=cfg.model, action_head_cfg=cfg.action_head, compute_dtype=compute_dtype)


def make_dyn_params(cfg: ExperimentConfig):
    return make_dynamics_params(
        veh=cfg.dynamics.veh.as_dict(),
        ped=cfg.dynamics.ped.as_dict(),
        cyc=cfg.dynamics.cyc.as_dict(),
        dt=cfg.dynamics.dt,
        use_veh_dynamics_for_all=cfg.dynamics.use_veh_dynamics_for_all,
    )


def init_params(cfg: ExperimentConfig, key: jax.Array, batch: Batch, training: bool = True):
    """Initialize all model parameters from a (synthetic) batch.

    Jitted end-to-end: on TPU-over-tunnel setups, eager init would pay
    dispatch latency per op; one compiled program avoids that.
    """
    model = make_model(cfg)

    @jax.jit
    def _init(key, batch):
        k_pre, k_init, k_do = jax.random.split(key, 3)
        pbatch = pre_processing(
            batch, cfg.model, n_step_hist=cfg.time_step_current + 1, training=training, key=k_pre
        )
        return model.init({"params": k_init, "dropout": k_do}, pbatch, method="init_all")

    variables = _init(key, batch)
    return model, variables["params"]


def tf_cfg_to_sim(tf) -> TeacherForcingConfig:
    return TeacherForcingConfig(
        step_spawn_agent=tf.step_spawn_agent,
        step_warm_start=tf.step_warm_start,
        step_horizon=tf.step_horizon,
        step_horizon_decrease_per_epoch=tf.step_horizon_decrease_per_epoch,
        prob_forcing_agent=tf.prob_forcing_agent,
        prob_forcing_agent_decrease_per_epoch=tf.prob_forcing_agent_decrease_per_epoch,
        gt_sdc=getattr(tf, "gt_sdc", False),
    )


def _apply_factory(model: TrafficBots, params):
    def model_apply(method: str, rngs=None, **kwargs):
        return model.apply({"params": params}, method=method, rngs=rngs or {}, **kwargs)

    return model_apply


def encode_episode_features(
    model: TrafficBots, params, batch: Batch, training: bool, key: Optional[jax.Array],
    share_map_encoding: Optional[bool] = None,
    allow_map_chunk: bool = True,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Run the three encoder views (input / latent_post / latent_prior).

    Ref waymo_motion.py:366-368; latent_post only exists when GT is available.

    The reference re-encodes the map for every view; here the map encoding is
    computed once and shared across views whenever they see the same map —
    i.e. unless the latent views are SE(2)-perturbed (perturb marker key in
    the batch). Training shares too (documented divergence, see below and
    docs/divergences.md): only the views' dropout draws would have differed.
    """
    if share_map_encoding is None:
        # Training also shares by default: the three views always see the
        # IDENTICAL map tensors (only agent/tl views differ), so sharing
        # changes nothing but the dropout-noise correlation between views —
        # while the map encoder is the single most expensive module in the
        # train step (fwd + BPTT backward x3 views). Documented divergence
        # (docs/divergences.md); share_map_encoding=False restores the
        # reference's independent per-view dropout draws
        # (ref waymo_motion.py:366-368).
        share_map_encoding = "latent_perturbed" not in batch
    # factored map attrs: input/map_attr is concat(type-one-hot broadcast
    # over nodes, node-index eye broadcast over scenes/polylines) — identical
    # across all views (one-hots are SE(2)-invariant, preprocessing.py:210).
    # Feeding the UN-broadcast factors as an MLP pair input lets fc0 run as
    # an [11]-matmul + a row-table add; the [B, P, N, 31] contract tensor
    # goes unconsumed and XLA dead-code-eliminates it from jitted programs
    # (it still exists for direct users of the pre-processing contract).
    map_attr_pair = None
    if "sc/map_type" in batch and "input/map_attr" in batch:
        ma = batch["input/map_attr"]
        n_node = ma.shape[2]
        if ma.shape[-1] == batch["sc/map_type"].shape[-1] + n_node:
            map_attr_pair = (
                batch["sc/map_type"].astype(ma.dtype)[:, :, None, :],
                jnp.eye(n_node, dtype=ma.dtype)[None, None],
            )
    out = {}
    shared_map = None
    # allow_map_chunk=False: set by mesh-sharded callers (Validator with a
    # "data" mesh axis) — inside a GSPMD-jitted step the batch axis here is
    # GLOBAL, so lax.map over global sub-batches would serialize the
    # otherwise data-parallel map encode and reshard every chunk across
    # devices. The chunk's HBM rationale is per-device, where the shard is
    # already batch/n_devices.
    chunk = model.cfg.map_encode_chunk
    if (
        allow_map_chunk
        and share_map_encoding
        and not training
        and chunk > 0
        and map_attr_pair is not None
        and "sc/map_pos" in batch
        and "sc/map_dir" in batch
        and batch["sc/map_pos"].shape[0] > chunk
        and batch["sc/map_pos"].shape[0] % chunk == 0
    ):
        shared_map = _encode_map_chunked(model, params, batch, chunk)
    for i, prefix in enumerate(("input", "latent_post", "latent_prior")):
        if f"{prefix}/agent_valid" not in batch:
            continue
        view = extract(batch, prefix)
        if map_attr_pair is not None and "map_attr" in view:
            view["map_attr"] = map_attr_pair
        if share_map_encoding and shared_map is not None:
            view["map_feature"], view["map_feature_valid"] = shared_map
        # fresh dropout draw per view (the reference calls each module anew,
        # consuming torch's global RNG — same-shaped views never share masks)
        rngs = (
            {"dropout": jax.random.fold_in(key, i)}
            if (training and key is not None) else {}
        )
        out[prefix] = model.apply(
            {"params": params}, method="encode_input_features",
            deterministic=not training, rngs=rngs, **view,
        )
        if share_map_encoding and shared_map is None:
            shared_map = (out[prefix]["map_feature"], out[prefix]["map_feature_valid"])
    return out


def _encode_map_chunked(
    model: TrafficBots, params, batch: Batch, chunk: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Episode map encode over scene sub-batches of `chunk` via lax.map.

    The map featurization temporaries ([B, 1024, 20, *] PE / input-MLP
    tensors) dominated the eval program's HBM peak and scale linearly with
    batch; per-scene results are batch-independent, so partitioning the
    scene axis is bit-identical (same per-row matmuls and reductions) while
    capping the peak at chunk size. The PE is recomputed per chunk from the
    raw sc/map_pos|dir (same call as preprocessing.sc_input), which lets XLA
    dead-code-eliminate the precomputed full-batch `input/map_pe`.
    Eval-only: callers gate on `not training` (dropout off inside lax.map).
    """
    map_valid = batch["input/map_valid"]  # == sc/map_valid when not training
    map_pos = batch["sc/map_pos"]
    map_dir = batch["sc/map_dir"]
    map_type = batch["sc/map_type"]
    n_scene, n_pl, n_node = map_valid.shape
    n_chunks = n_scene // chunk
    eye = jnp.eye(n_node, dtype=map_pos.dtype)[None, None]

    def part(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    def body(xs):
        v, p, d, t = xs
        pe = pose_pe(p, d, model.cfg.pose_pe_map, model.cfg.pe_dim)
        attr = (t.astype(p.dtype)[:, :, None, :], eye)
        return model.apply(
            {"params": params}, method="map_only",
            map_valid=v, map_attr=attr, map_pe=pe, deterministic=True,
        )

    feat, valid = jax.lax.map(
        body, (part(map_valid), part(map_pos), part(map_dir), part(map_type))
    )
    return (
        feat.reshape((n_scene,) + feat.shape[2:]),
        valid.reshape((n_scene,) + valid.shape[2:]),
    )


def build_rollout_features(batch: Batch, input_features: Dict[str, jnp.ndarray]) -> Batch:
    """Assemble the rollout features dict. Ref waymo_motion.py:449-462."""
    feats = {
        "map_valid": input_features["map_feature_valid"],
        "map_feature": input_features["map_feature"],
        "tl_valid": input_features["tl_feature_valid"],
        "tl_feature": input_features["tl_feature"],
        "agent_type": batch["sc/agent_type"],
        "agent_size": batch["sc/agent_size"],
        "agent_valid": batch["agent/valid"],
        "vel": batch["agent/vel"],
        "acc": batch["agent/acc"],
        "yaw_rate": batch["agent/yaw_rate"],
        "agent_state": jnp.concatenate(
            [batch["agent/pos"], batch["agent/yaw_bbox"], batch["agent/spd"]], axis=-1
        ),
    }
    # raw tl_stop slices for the rule checker (red light / passive checks)
    feats["tl_stop_valid"] = batch["tl_stop/valid"]
    feats["tl_stop_pos"] = batch["tl_stop/pos"]
    feats["tl_stop_state"] = batch["tl_stop/state"]
    return feats


def make_rule_constants(cfg: ExperimentConfig, batch: Batch, goal, dest) -> RU.RuleConstants:
    rcfg = RU.RuleConfig(
        enable_check_collided=cfg.rule_checker.enable_check_collided,
        enable_check_run_road_edge=cfg.rule_checker.enable_check_run_road_edge,
        enable_check_run_red_light=cfg.rule_checker.enable_check_run_red_light,
        enable_check_passive=cfg.rule_checker.enable_check_passive,
        collision_size_scale=cfg.rule_checker.collision_size_scale,
    )
    return RU.init_rule_constants(
        map_boundary=batch["map/boundary"],
        map_valid=batch["map/valid"],
        map_type=batch["map/type"],
        map_pos=batch["map/pos"],
        map_dir=batch["map/dir"],
        agent_type=batch["agent/type"] if "agent/type" in batch else batch["history/agent/type"],
        agent_size=batch["agent/size"] if "agent/size" in batch else batch["history/agent/size"],
        agent_goal=goal,
        agent_dest=dest,
        cfg=rcfg,
    )


def reactive_replay(
    cfg: ExperimentConfig,
    model: TrafficBots,
    params,
    batch: Batch,
    features: Dict[str, jnp.ndarray],
    latent_dist,
    goal,
    goal_valid,
    mask_teacher_forcing,
    key: jax.Array,
    deterministic_latent,
    deterministic_action: bool,
    training: bool = False,
    collect_attention: bool = False,
) -> RolloutOutput:
    """Scene reconstruction rollout. Ref waymo_motion.py:420-476."""
    return rollout(
        **_sim_kwargs(cfg, model, params, batch, features, latent_dist, goal,
                      goal_valid, mask_teacher_forcing, key,
                      deterministic_latent, deterministic_action),
        training=training,
        collect_attention=collect_attention,
    )


def _sim_kwargs(cfg, model, params, batch, features, latent_dist, goal,
                goal_valid, mask_teacher_forcing, key,
                deterministic_latent, deterministic_action):
    """Shared simulation-setup preamble of `reactive_replay` and
    `interactive_replay` — one place assembles dynamics params, rule
    constants and rollout features, so the interactive path can never drift
    from the scan path (tests/test_interactive.py relies on equivalence)."""
    return dict(
        cfg=cfg,
        model_apply=_apply_factory(model, params),
        dyn_params=make_dyn_params(cfg),
        rule_consts=make_rule_constants(
            cfg, batch, batch.get("agent/goal"), batch.get("agent/dest")
        ),
        features=build_rollout_features(batch, features),
        latent_dist=latent_dist,
        goal=goal,
        goal_valid=goal_valid,
        mask_teacher_forcing=mask_teacher_forcing,
        key=key,
        deterministic_latent=deterministic_latent,
        deterministic_action=deterministic_action,
        step_start=cfg.time_step_sim_start,
        step_end=cfg.time_step_end,
    )


def interactive_replay(
    cfg: ExperimentConfig,
    model: TrafficBots,
    params,
    batch: Batch,
    features: Dict[str, jnp.ndarray],
    latent_dist,
    goal,
    goal_valid,
    mask_teacher_forcing,
    key: jax.Array,
    deterministic_latent=True,
    deterministic_action: bool = True,
):
    """Step-at-a-time variant of `reactive_replay`: same inputs, returns an
    `InteractiveSim` whose `.step()` can inject per-step overrides
    (sim-as-a-service / what-if intervention; see sim/interactive.py).
    `.run_to_end().finish()` reproduces `reactive_replay` (booleans exactly,
    floats to XLA-fusion tolerance)."""
    from .sim.interactive import make_interactive_sim

    return make_interactive_sim(
        **_sim_kwargs(cfg, model, params, batch, features, latent_dist, goal,
                      goal_valid, mask_teacher_forcing, key,
                      deterministic_latent, deterministic_action),
    )


def _repeat_batch_keys(batch: Batch, keys, k: int) -> Batch:
    out = dict(batch)
    for key in keys:
        if key in batch:
            out[key] = jnp.repeat(batch[key], k, axis=0)
    return out


def joint_future_pred(
    cfg: ExperimentConfig,
    model: TrafficBots,
    params,
    batch: Batch,
    input_features: Dict[str, jnp.ndarray],
    latent_dist,
    goal_dist,
    goal_valid,
    key: jax.Array,
) -> Tuple[RolloutOutput, Optional[jnp.ndarray], jnp.ndarray]:
    """K-sample joint future prediction. Ref waymo_motion.py:478-572.

    Returns (rollout flattened to [B, A, K, S, ...], goal_sample [B, A, K(,2)],
    goal_log_probs [B, A, K]).
    """
    k_futures = cfg.n_joint_future
    key, k_goal, k_roll = jax.random.split(key, 3)

    # deterministic mask: K=0 deterministic, K=1.. stochastic (ref :489-491)
    hist_valid = batch["history/agent/valid"] if "history/agent/valid" in batch else batch["agent/valid"][:, :1]
    n_batch, _, n_agent = hist_valid.shape
    det = jnp.zeros((n_batch * k_futures, n_agent), dtype=bool)
    det = det.at[::k_futures].set(True)

    latent_k = latent_dist.repeat(k_futures, axis=0) if latent_dist is not None else None

    goal_sample = None
    goal_log_probs = jnp.zeros((n_batch, n_agent, k_futures))
    goal_valid_k = None
    rc_goal = None
    rc_dest = None
    if goal_dist is not None:
        goal_k = goal_dist.repeat(k_futures, axis=0)
        goal_sample = goal_k.sample(k_goal, det)
        glp = goal_k.log_prob(goal_sample)
        goal_valid_k = jnp.repeat(goal_valid, k_futures, axis=0)
        if cfg.model.goal_manager.goal_attr_mode == "dest":
            rc_dest = goal_sample
        elif cfg.model.goal_manager.goal_attr_mode == "goal_xy":
            rc_goal = goal_sample
        goal_log_probs = jnp.swapaxes(glp.reshape(n_batch, k_futures, n_agent), 1, 2)

    if rc_dest is None and "agent/dest" in batch:
        rc_dest = jnp.repeat(batch["agent/dest"], k_futures, axis=0)
    if rc_goal is None and "agent/goal" in batch:
        rc_goal = jnp.repeat(batch["agent/goal"], k_futures, axis=0)
    if rc_goal is not None and rc_goal.shape[-1] == 2:
        # sampled goal_xy has no yaw/spd; pad (goal-reached check needs 4 dims)
        rc_goal = jnp.concatenate([rc_goal, jnp.zeros_like(rc_goal)], axis=-1)

    rep_keys = [
        "map/boundary", "map/valid", "map/type", "map/pos", "map/dir",
        "tl_stop/valid", "tl_stop/pos", "tl_stop/state",
        "sc/agent_type", "sc/agent_size",
        "agent/valid", "agent/vel", "agent/acc", "agent/yaw_rate",
        "agent/pos", "agent/yaw_bbox", "agent/spd",
        "history/agent/type", "history/agent/size",
        "history/tl_stop/valid", "history/tl_stop/pos", "history/tl_stop/state",
    ]
    batch_k = _repeat_batch_keys(batch, rep_keys, k_futures)
    # rule checker uses history tl when available (ref waymo_motion.py:522-524)
    if "history/tl_stop/valid" in batch:
        batch_k["tl_stop/valid"] = batch_k["history/tl_stop/valid"]
        batch_k["tl_stop/pos"] = batch_k["history/tl_stop/pos"]
        batch_k["tl_stop/state"] = batch_k["history/tl_stop/state"]
    batch_k["agent/type"] = (
        batch_k.get("history/agent/type", batch_k.get("sc/agent_type"))
    )
    batch_k["agent/size"] = (
        batch_k.get("history/agent/size", batch_k.get("sc/agent_size"))
    )
    batch_k["agent/goal"] = rc_goal
    batch_k["agent/dest"] = rc_dest

    feats_k = {
        k: jnp.repeat(v, k_futures, axis=0) for k, v in input_features.items()
    }

    mask_tf = teacher_forcing_mask(
        tf_cfg_to_sim(cfg.tf_joint_future_pred), batch_k["agent/valid"]
    )

    rule_consts = make_rule_constants(cfg, batch_k, rc_goal, rc_dest)
    buf = rollout(
        cfg=cfg,
        model_apply=_apply_factory(model, params),
        dyn_params=make_dyn_params(cfg),
        rule_consts=rule_consts,
        features=build_rollout_features(batch_k, feats_k),
        latent_dist=latent_k,
        goal=goal_sample,
        goal_valid=goal_valid_k,
        mask_teacher_forcing=mask_tf,
        key=k_roll,
        deterministic_latent=det,
        deterministic_action=True,
        step_start=cfg.time_step_sim_start,
        step_end=cfg.time_step_end,
        training=False,
    )
    buf = buf.flatten_repeat(k_futures)

    if goal_sample is not None:
        if cfg.model.goal_manager.goal_attr_mode == "dest":
            goal_sample = jnp.swapaxes(goal_sample.reshape(n_batch, k_futures, n_agent), 1, 2)
        else:
            d = goal_sample.shape[-1]
            goal_sample = jnp.swapaxes(
                goal_sample.reshape(n_batch, k_futures, n_agent, d), 1, 2
            )
    return buf, goal_sample, goal_log_probs


def training_step(
    cfg: ExperimentConfig,
    model: TrafficBots,
    params,
    batch: Batch,
    key: jax.Array,
    current_epoch: int = 0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One full training forward pass -> (loss, metrics). Ref waymo_motion.py:356-418."""
    k_pre, k_enc, k_goal, k_lat, k_coin, k_tf, k_roll, k_irr = jax.random.split(key, 8)

    batch = pre_processing(
        batch, cfg.model, n_step_hist=cfg.time_step_current + 1, training=True, key=k_pre
    )
    feats = encode_episode_features(model, params, batch, training=True, key=k_enc)
    input_dict = extract(batch, "input")

    # goal
    goal_gt = goal_valid = goal_pred = None
    rngs = {"dropout": k_goal}
    if cfg.model.goal_manager.goal_attr_mode != "dummy":
        goal_gt, goal_valid = get_gt_goal(cfg, input_dict["agent_valid"], batch["gt/goal"], batch["gt/dest"])
        goal_pred = model.apply(
            {"params": params}, method="pred_goal", rngs=rngs,
            deterministic=False,
            agent_type=batch["ref/agent_type"], map_type=batch["ref/map_type"],
            agent_state=batch["ref/agent_state"], **feats["input"],
        )

    # latents — distinct dropout streams for posterior vs prior (the
    # reference's two LatentEncoder calls each consume fresh torch RNG)
    k_lat_post, k_lat_prior = jax.random.split(k_lat)
    latent_post = model.apply(
        {"params": params}, method="latent", posterior=True, deterministic=False,
        rngs={"dropout": k_lat_post}, **feats["latent_post"],
    )
    latent_prior = model.apply(
        {"params": params}, method="latent", posterior=False, deterministic=False,
        rngs={"dropout": k_lat_prior}, **feats["latent_prior"],
    )
    use_prior = jax.random.uniform(k_coin, ()) < cfg.p_training_rollout_prior
    # branchless select between posterior/prior pytrees (ref waymo_motion.py:384-387)
    latent = jax.tree.map(
        lambda a, b: jnp.where(use_prior, a, b) if a is not None else None,
        latent_prior, latent_post,
    )

    mask_tf = teacher_forcing_mask(
        tf_cfg_to_sim(cfg.tf_training), batch["gt/valid"], current_epoch, key=k_tf
    )

    buf = reactive_replay(
        cfg, model, params, batch, feats["input"], latent,
        goal_gt, goal_valid, mask_tf, k_roll,
        deterministic_latent=False,
        deterministic_action=cfg.training_deterministic_action,
        training=True,
    )

    loss, metrics = training_loss(
        cfg.training_metrics,
        pred_valid=buf.valid,
        diffbar_rewards_valid=buf.diffbar_rewards_valid,
        diffbar_rewards=buf.diffbar_rewards,
        override_masks=buf.override_masks,
        agent_role=batch["ref/agent_role"],
        goal_valid=goal_valid,
        goal_pred=goal_pred,
        goal_gt=goal_gt,
        latent_post=latent_post,
        latent_prior=latent_prior,
        step_start=cfg.time_step_sim_start,
        irrelevant_key=k_irr,
    )
    return loss, metrics


def get_gt_goal(cfg: ExperimentConfig, agent_valid, gt_goal, gt_dest):
    """Ref goal_manager.py:49-75 (pure)."""
    mode = cfg.model.goal_manager.goal_attr_mode
    if mode == "dummy":
        return None, None
    valid = jnp.any(agent_valid, axis=1)
    if mode == "dest":
        return gt_dest, valid
    return gt_goal[..., :2], valid
