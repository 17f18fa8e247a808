"""On-device pre-processing: scene-centric views, input featurization, latent views.

Pure-function port of the reference L2 layer:
  - scene_centric.py:14-135  (SceneCentricPreProcessing)
  - sc_input.py:50-165       (SceneCentricInput)
  - sc_latent.py:37-241      (SceneCentricLatent)

The reference mutates a batch dict through an nn.Sequential; here each stage
is a pure jnp function batch -> new keys. All of it runs inside the jitted
train/eval step (no grad flows through; the reference wraps it in no_grad —
we stop_gradient at the consumer instead since inputs are data, not params).

Keys follow the reference contract ("sc/", "gt/", "ref/", "input/",
"latent_prior/", "latent_post/") so tests and downstream code can be
checked against SURVEY.md line by line.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..geometry import dir2local, pos2local, pose_pe, rad2local, rad2rot

Batch = Dict[str, jnp.ndarray]


def scene_centric(batch: Batch, n_step_hist: int, training: bool) -> Batch:
    """Slice history views and build sc/, gt/, ref/ keys. Ref scene_centric.py:93-135."""
    out = dict(batch)
    prefix = "" if training else "history/"

    for k in ("valid", "pos", "z", "vel", "spd", "acc", "yaw_bbox", "yaw_rate"):
        out[f"sc/agent_{k}"] = batch[f"{prefix}agent/{k}"][:, :n_step_hist]
    for k in ("type", "role", "size"):
        out[f"sc/agent_{k}"] = batch[f"{prefix}agent/{k}"]

    if "agent/valid" in batch:
        for k in ("cmd", "goal", "dest"):
            out[f"gt/{k}"] = batch[f"agent/{k}"]
        for k in ("valid", "spd", "pos", "vel", "yaw_bbox"):
            out[f"gt/{k}"] = batch[f"agent/{k}"]
        out["gt/state"] = jnp.concatenate(
            [out["gt/pos"], out["gt/yaw_bbox"], out["gt/spd"]], axis=-1
        )

    for k in ("valid", "type", "pos", "dir"):
        out[f"sc/map_{k}"] = batch[f"map/{k}"]
    for k in ("valid", "state", "pos", "dir"):
        out[f"sc/tl_{k}"] = batch[f"{prefix}tl_stop/{k}"][:, :n_step_hist]

    if not training and "history/agent_no_sim/valid" in batch:
        for k in ("valid", "pos", "z", "vel", "spd", "yaw_bbox"):
            out[f"sc/agent_no_sim_{k}"] = batch[f"history/agent_no_sim/{k}"][:, :n_step_hist]
        for k in ("type", "size"):
            out[f"sc/agent_no_sim_{k}"] = batch[f"history/agent_no_sim/{k}"]

    out["ref/agent_type"] = batch[f"{prefix}agent/type"]
    out["ref/agent_role"] = batch[f"{prefix}agent/role"]
    out["ref/map_type"] = batch["map/type"]
    out["ref/agent_state"] = jnp.concatenate(
        [out["sc/agent_pos"], out["sc/agent_yaw_bbox"], out["sc/agent_spd"]], axis=-1
    )
    return out


def agent_attr_and_pe(
    cfg: ModelConfig,
    agent_pos: jnp.ndarray,  # [..., 2]
    agent_yaw_bbox: jnp.ndarray,  # [..., 1]
    agent_vel: jnp.ndarray,
    agent_spd: jnp.ndarray,
    agent_yaw_rate: jnp.ndarray,
    agent_acc: jnp.ndarray,
    agent_size: jnp.ndarray,
    agent_type: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-step agent featurizer used inside the rollout. Ref sc_input.py:142-165."""
    attr = jnp.concatenate(
        [
            agent_vel,
            agent_spd,
            agent_yaw_rate,
            agent_acc,
            agent_size,
            agent_type.astype(agent_vel.dtype),
        ],
        axis=-1,
    )
    pe = pose_pe(agent_pos, agent_yaw_bbox, cfg.pose_pe_agent, cfg.pe_dim)
    return attr, pe


def sc_input(
    batch: Batch,
    cfg: ModelConfig,
    n_step_hist: int,
    training: bool,
    key: Optional[jax.Array] = None,
) -> Batch:
    """Build input/ features. Ref sc_input.py:50-140."""
    out = dict(batch)
    agent_valid = batch["sc/agent_valid"]
    tl_valid = batch["sc/tl_valid"]
    map_valid = batch["sc/map_valid"]

    if training and 0 < cfg.dropout_p_history <= 1.0:
        assert key is not None
        k1, k2, k3 = jax.random.split(key, 3)
        keep = 1.0 - cfg.dropout_p_history
        drop_a = jax.random.bernoulli(k1, keep, agent_valid[:, :-1].shape)
        agent_valid = agent_valid.at[:, :-1].set(agent_valid[:, :-1] & drop_a)
        tl_valid = tl_valid & jax.random.bernoulli(k2, keep, tl_valid.shape)
        map_valid = map_valid & jax.random.bernoulli(k3, keep, map_valid.shape)

    out["input/agent_valid"] = agent_valid
    out["input/tl_valid"] = tl_valid
    out["input/map_valid"] = map_valid

    out["input/agent_pos"] = batch["sc/agent_pos"]
    n_scene, _, n_agent = agent_valid.shape
    size_exp = jnp.broadcast_to(
        batch["sc/agent_size"][:, None], (n_scene, n_step_hist, n_agent, 3)
    )
    type_exp = jnp.broadcast_to(
        batch["sc/agent_type"][:, None], (n_scene, n_step_hist, n_agent, 3)
    )
    out["input/agent_attr"] = jnp.concatenate(
        [
            batch["sc/agent_vel"],
            batch["sc/agent_spd"],
            batch["sc/agent_yaw_rate"],
            batch["sc/agent_acc"],
            size_exp,
            type_exp.astype(batch["sc/agent_vel"].dtype),
        ],
        axis=-1,
    )
    out["input/agent_pe"] = pose_pe(
        batch["sc/agent_pos"], batch["sc/agent_yaw_bbox"], cfg.pose_pe_agent, cfg.pe_dim
    )

    n_pl, n_pl_node = map_valid.shape[1:3]
    out["input/map_pos"] = batch["sc/map_pos"][:, :, 0]
    node_ohe = jnp.broadcast_to(
        jnp.eye(n_pl_node, dtype=batch["sc/map_pos"].dtype)[None, None],
        (n_scene, n_pl, n_pl_node, n_pl_node),
    )
    type_ohe = jnp.broadcast_to(
        batch["sc/map_type"][:, :, None].astype(batch["sc/map_pos"].dtype),
        (n_scene, n_pl, n_pl_node, batch["sc/map_type"].shape[-1]),
    )
    out["input/map_attr"] = jnp.concatenate([type_ohe, node_ohe], axis=-1)
    out["input/map_pe"] = pose_pe(
        batch["sc/map_pos"], batch["sc/map_dir"], cfg.pose_pe_map, cfg.pe_dim
    )

    out["input/tl_pos"] = batch["sc/tl_pos"]
    out["input/tl_attr"] = batch["sc/tl_state"].astype(batch["sc/tl_pos"].dtype)
    out["input/tl_pe"] = pose_pe(
        batch["sc/tl_pos"], batch["sc/tl_dir"], cfg.pose_pe_tl, cfg.pe_dim
    )
    return out


def sc_latent(
    batch: Batch,
    cfg: ModelConfig,
    training: bool,
    key: Optional[jax.Array] = None,
) -> Batch:
    """Build latent_prior/ and latent_post/ views. Ref sc_latent.py:114-241.

    The optional SE(2) perturbation of the latent-encoder inputs
    (perturb_input_to_latent, off by default) re-expresses the prior view in
    a random frame so the latent cannot cheat on absolute coordinates.
    """
    out = dict(batch)
    gt_available = "agent/valid" in batch
    perturb = training and cfg.perturb_input_to_latent

    if perturb:
        assert key is not None
        # marker consumed by orchestration.encode_episode_features: the
        # latent views see a different (perturbed) map, so the map encoding
        # must NOT be shared across views
        out["latent_perturbed"] = jnp.ones((), bool)
        k_yaw, k_pos, key = jax.random.split(key, 3)
        n_scene = batch["sc/agent_pos"].shape[0]
        rand_yaw = jax.random.uniform(
            k_yaw, (n_scene,), minval=-cfg.perturb_max_rad, maxval=cfg.perturb_max_rad
        )
        rand_rot = rad2rot(rand_yaw)
        rand_pos = jax.random.uniform(
            k_pos, (n_scene, 2), minval=-cfg.perturb_max_meter, maxval=cfg.perturb_max_meter
        )
        r_yaw = rand_yaw[:, None, None]
        r_rot = rand_rot[:, None]
        r_pos = rand_pos[:, None, None, :]

    # ---- map
    if perturb:
        n_scene, n_pl, n_pl_node = batch["sc/map_valid"].shape
        map_pos = pos2local(batch["sc/map_pos"], r_pos, r_rot)
        map_dir = dir2local(batch["sc/map_dir"], r_rot)
        out["latent_prior/map_pos"] = map_pos[:, :, 0]
        out["latent_prior/map_attr"] = batch["input/map_attr"]
        out["latent_prior/map_pe"] = pose_pe(map_pos, map_dir, cfg.pose_pe_map, cfg.pe_dim)
        out["latent_prior/map_valid"] = batch["sc/map_valid"]
    else:
        for k in ("valid", "pos", "attr", "pe"):
            out[f"latent_prior/map_{k}"] = out[f"input/map_{k}"]
    if gt_available:
        for k in ("valid", "pos", "attr", "pe"):
            out[f"latent_post/map_{k}"] = out[f"latent_prior/map_{k}"]

    # ---- traffic lights
    def _tl_view(tl_valid, tl_pos, tl_dir, tl_state, drop_key):
        if training and 0 < cfg.dropout_p_history <= 1.0:
            tl_valid = tl_valid & jax.random.bernoulli(
                drop_key, 1.0 - cfg.dropout_p_history, tl_valid.shape
            )
        if perturb:
            tl_pos = pos2local(tl_pos, r_pos, r_rot)
            tl_dir = dir2local(tl_dir, r_rot)
        return tl_valid, tl_pos, tl_state.astype(tl_pos.dtype), pose_pe(
            tl_pos, tl_dir, cfg.pose_pe_tl, cfg.pe_dim
        )

    if perturb:
        key, k_tl = jax.random.split(key)
        v, p, a, pe = _tl_view(
            batch["sc/tl_valid"], batch["sc/tl_pos"], batch["sc/tl_dir"], batch["sc/tl_state"], k_tl
        )
        out["latent_prior/tl_valid"], out["latent_prior/tl_pos"] = v, p
        out["latent_prior/tl_attr"], out["latent_prior/tl_pe"] = a, pe
    else:
        for k in ("valid", "pos", "attr", "pe"):
            out[f"latent_prior/tl_{k}"] = out[f"input/tl_{k}"]
    if gt_available:
        if key is not None:
            key, k_tl2 = jax.random.split(key)
        else:
            k_tl2 = None
        v, p, a, pe = _tl_view(
            batch["tl_stop/valid"], batch["tl_stop/pos"], batch["tl_stop/dir"],
            batch["tl_stop/state"], k_tl2,
        )
        out["latent_post/tl_valid"], out["latent_post/tl_pos"] = v, p
        out["latent_post/tl_attr"], out["latent_post/tl_pe"] = a, pe

    # ---- agents
    def _agent_view(valid, pos, vel, yaw, spd, yaw_rate, acc, size, atype, drop_key, drop_last=False):
        if training and 0 < cfg.dropout_p_history <= 1.0:
            keep = 1.0 - cfg.dropout_p_history
            if drop_last:
                m = jax.random.bernoulli(drop_key, keep, valid[:, :-1].shape)
                valid = valid.at[:, :-1].set(valid[:, :-1] & m)
            else:
                valid = valid & jax.random.bernoulli(drop_key, keep, valid.shape)
        if perturb:
            pos = pos2local(pos, r_pos, r_rot)
            vel = dir2local(vel, r_rot)
            yaw = rad2local(yaw[..., 0], r_yaw[..., 0], cast=False)[..., None]
        n_step = valid.shape[1]
        n_scene, _, n_agent = valid.shape
        attr = jnp.concatenate(
            [
                vel, spd, yaw_rate, acc,
                jnp.broadcast_to(size[:, None], (n_scene, n_step, n_agent, 3)),
                jnp.broadcast_to(atype[:, None], (n_scene, n_step, n_agent, 3)).astype(vel.dtype),
            ],
            axis=-1,
        )
        return valid, pos, attr, pose_pe(pos, yaw, cfg.pose_pe_agent, cfg.pe_dim)

    if perturb:
        key, k_a = jax.random.split(key)
        v, p, a, pe = _agent_view(
            batch["sc/agent_valid"], batch["sc/agent_pos"], batch["sc/agent_vel"],
            batch["sc/agent_yaw_bbox"], batch["sc/agent_spd"], batch["sc/agent_yaw_rate"],
            batch["sc/agent_acc"], batch["sc/agent_size"], batch["sc/agent_type"],
            k_a, drop_last=True,
        )
        out["latent_prior/agent_valid"], out["latent_prior/agent_pos"] = v, p
        out["latent_prior/agent_attr"], out["latent_prior/agent_pe"] = a, pe
    else:
        for k in ("valid", "pos", "attr", "pe"):
            out[f"latent_prior/agent_{k}"] = out[f"input/agent_{k}"]

    if gt_available:
        if key is not None:
            key, k_a2 = jax.random.split(key)
        else:
            k_a2 = None
        v, p, a, pe = _agent_view(
            batch["agent/valid"], batch["agent/pos"], batch["agent/vel"],
            batch["agent/yaw_bbox"], batch["agent/spd"], batch["agent/yaw_rate"],
            batch["agent/acc"], batch["agent/size"], batch["agent/type"],
            k_a2,
        )
        out["latent_post/agent_valid"], out["latent_post/agent_pos"] = v, p
        out["latent_post/agent_attr"], out["latent_post/agent_pe"] = a, pe

    return out


def pre_processing(
    batch: Batch,
    cfg: ModelConfig,
    n_step_hist: int = 11,
    training: bool = True,
    key: Optional[jax.Array] = None,
) -> Batch:
    """Full L2 pipeline: scene_centric -> sc_input -> sc_latent."""
    if key is not None:
        k1, k2 = jax.random.split(key)
    else:
        k1 = k2 = None
    batch = scene_centric(batch, n_step_hist, training)
    batch = sc_input(batch, cfg, n_step_hist, training, k1)
    batch = sc_latent(batch, cfg, training, k2)
    return batch


def extract(batch: Batch, prefix: str) -> Batch:
    """Strip a 'prefix/' namespace, e.g. extract(batch, 'input')."""
    p = prefix + "/"
    return {k[len(p):]: v for k, v in batch.items() if k.startswith(p)}
