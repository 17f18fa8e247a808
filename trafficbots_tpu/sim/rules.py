"""Traffic-rule checking as pure functions over (constants, accumulator) pytrees.

TPU-native redesign of /root/reference/src/utils/traffic_rule_checker.py. The
reference is a stateful object constructed per rollout; here the per-episode
precomputations live in `RuleConstants` (built once, outside the scan) and the
sticky violation flags live in `RuleState` (a scan carry). `check_rules` is a
pure function evaluated every scan step with the per-step traffic-light slice
supplied as scan xs, so there is no data-dependent control flow on device.

The enable flags are static config, so disabled checks compile to nothing —
matching the reference default where only outside_map is enabled
(configs/model/traffic_bots.yaml:240-244).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..geometry import cast_rad


@struct.dataclass
class RuleConfig:
    enable_check_collided: bool = struct.field(pytree_node=False, default=False)
    enable_check_run_road_edge: bool = struct.field(pytree_node=False, default=False)
    enable_check_run_red_light: bool = struct.field(pytree_node=False, default=False)
    enable_check_passive: bool = struct.field(pytree_node=False, default=False)
    collision_size_scale: float = struct.field(pytree_node=False, default=1.1)


@struct.dataclass
class RuleConstants:
    """Per-episode precomputation. Ref: traffic_rule_checker.py:29-98."""

    agent_size: jnp.ndarray  # [n, a, 2] scaled (length, width)
    map_boundary: jnp.ndarray  # [n, 4]
    veh_mask: jnp.ndarray  # [n, a] bool
    collision_invalid_mask: jnp.ndarray  # [n, a, a] bool
    road_edge: jnp.ndarray  # [n, n_pl*20, 2, 2]
    road_edge_valid: jnp.ndarray  # [n, n_pl*20]
    lane_center: jnp.ndarray  # [n, n_pl*20, 2]
    lane_center_valid: jnp.ndarray  # [n, n_pl*20]
    rrl_agent_length: jnp.ndarray  # [n, a, 1]
    rrl_agent_width: jnp.ndarray  # [n, a, 1]
    # goal / dest conditioning (None when unavailable)
    agent_goal: Optional[jnp.ndarray] = None  # [n, a, 4]
    goal_thresh_pos: Optional[jnp.ndarray] = None  # [n, a]
    agent_dest: Optional[jnp.ndarray] = None  # [n, a] int
    dest_valid: Optional[jnp.ndarray] = None  # [n, a, 20]
    dest_type: Optional[jnp.ndarray] = None  # [n, a, 11]
    dest_pos: Optional[jnp.ndarray] = None  # [n, a, 20, 2]
    dest_dir: Optional[jnp.ndarray] = None  # [n, a, 20, 2] unit
    dest_thresh_pos: Optional[jnp.ndarray] = None  # [n, a]


GOAL_THRESH_ROT = math.radians(15.0)
DEST_THRESH_ROT = math.radians(30.0)


@struct.dataclass
class RuleState:
    """Sticky violation accumulators. Ref: traffic_rule_checker.py:45-52."""

    outside_map: jnp.ndarray
    collided: jnp.ndarray
    run_road_edge: jnp.ndarray
    run_red_light: jnp.ndarray
    passive: jnp.ndarray
    passive_counter: jnp.ndarray  # float32
    goal_reached: jnp.ndarray
    dest_reached: jnp.ndarray


def init_rule_constants(
    map_boundary: jnp.ndarray,  # [n, 4]
    map_valid: jnp.ndarray,  # [n, n_pl, 20]
    map_type: jnp.ndarray,  # [n, n_pl, 11] bool one-hot
    map_pos: jnp.ndarray,  # [n, n_pl, 20, 2]
    map_dir: jnp.ndarray,  # [n, n_pl, 20, 2]
    agent_type: jnp.ndarray,  # [n, a, 3] bool one-hot
    agent_size: jnp.ndarray,  # [n, a, 3]
    agent_goal: Optional[jnp.ndarray] = None,  # [n, a, 4]
    agent_dest: Optional[jnp.ndarray] = None,  # [n, a] int
    cfg: RuleConfig = RuleConfig(),
) -> RuleConstants:
    """Ref: traffic_rule_checker.py:29-98 (constructor precomputation)."""
    n_batch, n_agent = agent_type.shape[:2]

    ego = jnp.eye(n_agent, dtype=bool)[None].repeat(n_batch, axis=0)
    ped_cyc = agent_type[:, :, 1]
    collision_invalid = ego | (ped_cyc[:, :, None] & ped_cyc[:, None, :])

    # road edges: types 4 (edge boundary), 5 (edge median), 7 (solid double)
    road_edge_valid = (map_valid & jnp.any(map_type[:, :, (4, 5, 7)], axis=-1, keepdims=True)).reshape(
        n_batch, -1
    )
    road_edge = jnp.stack([map_pos, map_pos + map_dir], axis=-2).reshape(n_batch, -1, 2, 2)

    # lane centers: types 0..2
    lane_center_valid = (map_valid & jnp.any(map_type[:, :, :3], axis=-1, keepdims=True)).reshape(
        n_batch, -1
    )
    lane_center = map_pos.reshape(n_batch, -1, 2)

    kw: Dict = {}
    if agent_goal is not None:
        kw["agent_goal"] = agent_goal
        kw["goal_thresh_pos"] = agent_size[:, :, 0] * 8.0
    if agent_dest is not None:
        bidx = jnp.arange(n_batch)[:, None]
        dest_valid = map_valid[bidx, agent_dest]
        dest_type = map_type[bidx, agent_dest]
        dest_pos = map_pos[bidx, agent_dest]
        dest_dir = map_dir[bidx, agent_dest]
        dest_dir = dest_dir / jnp.linalg.norm(dest_dir, axis=-1, keepdims=True)
        # thresh 50 m for lanes, 10 m for road edges
        dest_thresh_pos = jnp.ones_like(agent_size[:, :, 0]) * 50.0
        dest_thresh_pos = dest_thresh_pos * (1.0 - dest_type[:, :, 4].astype(jnp.float32) * 0.8)
        kw.update(
            agent_dest=agent_dest,
            dest_valid=dest_valid,
            dest_type=dest_type,
            dest_pos=dest_pos,
            dest_dir=dest_dir,
            dest_thresh_pos=dest_thresh_pos,
        )

    return RuleConstants(
        agent_size=agent_size[..., :2] * cfg.collision_size_scale,
        map_boundary=map_boundary,
        veh_mask=agent_type[:, :, 0],
        collision_invalid_mask=collision_invalid,
        road_edge=road_edge,
        road_edge_valid=road_edge_valid,
        lane_center=lane_center,
        lane_center_valid=lane_center_valid,
        rrl_agent_length=agent_size[:, :, 0:1] * 0.5 * 0.6,
        rrl_agent_width=agent_size[:, :, 1:2] * 0.5 * 1.8,
        **kw,
    )


def init_rule_state(n_batch: int, n_agent: int) -> RuleState:
    b = jnp.zeros((n_batch, n_agent), dtype=bool)
    return RuleState(
        outside_map=b,
        collided=b,
        run_road_edge=b,
        run_red_light=b,
        passive=b,
        passive_counter=jnp.zeros((n_batch, n_agent), dtype=jnp.float32),
        goal_reached=b,
        dest_reached=b,
    )


def agent_bbox_corners(agent_states: jnp.ndarray, agent_size: jnp.ndarray) -> jnp.ndarray:
    """Oriented bbox corners [n, a, 4, 2]. Ref: traffic_rule_checker.py:518-543."""
    c = jnp.cos(agent_states[..., 2])
    s = jnp.sin(agent_states[..., 2])
    heading_f = jnp.stack([c, s], axis=-1)
    heading_r = jnp.stack([s, -c], axis=-1)
    off_f = 0.5 * agent_size[..., 0:1] * heading_f
    off_r = 0.5 * agent_size[..., 1:2] * heading_r
    corners = jnp.stack(
        [-off_f + off_r, off_f + off_r, off_f - off_r, -off_f - off_r], axis=2
    )
    return agent_states[:, :, None, :2] + corners


def _check_outside_map(valid, state, map_boundary):
    """Ref: traffic_rule_checker.py:100-119."""
    x = state[:, :, 0]
    y = state[:, :, 1]
    xmin, xmax, ymin, ymax = (map_boundary[:, i : i + 1] for i in range(4))
    return ((x > xmax) | (x < xmin) | (y > ymax) | (y < ymin)) & valid


def _check_collided(valid, bbox, collision_invalid_mask):
    """Separating-lines bbox overlap test. Ref: traffic_rule_checker.py:121-160."""
    bbox_next = jnp.roll(bbox, -1, axis=2)
    # ax + by + c = 0 for each bbox edge
    line = jnp.concatenate(
        [
            bbox_next[..., 1:2] - bbox[..., 1:2],
            bbox[..., 0:1] - bbox_next[..., 0:1],
            bbox_next[..., 0:1] * bbox[..., 1:2] - bbox_next[..., 1:2] * bbox[..., 0:1],
        ],
        axis=-1,
    )  # [n, a, 4, 3]
    point = jnp.concatenate([bbox, jnp.ones_like(bbox[..., :1])], axis=-1)  # [n, a, 4, 3]

    # [n, ai, aj, 4(lines of ai), 4(points of aj)]
    is_outside = (
        jnp.einsum("nilc,njpc->nijlp", line, point) > 0
    )
    no_collision = jnp.any(jnp.all(is_outside, axis=-1), axis=-1)  # [n, ai, aj]
    no_collision = no_collision | jnp.swapaxes(no_collision, 1, 2)
    invalid = ~(valid[:, :, None] & valid[:, None, :])
    no_collision = no_collision | collision_invalid_mask | invalid
    return ~jnp.all(no_collision, axis=-1)


def _ccw(A, B, C):
    """Ref: traffic_rule_checker.py:594-595."""
    return (C[..., 1] - A[..., 1]) * (B[..., 0] - A[..., 0]) > (B[..., 1] - A[..., 1]) * (
        C[..., 0] - A[..., 0]
    )


def _check_run_road_edge(valid, bbox, veh_mask, road_edge, road_edge_valid):
    """Segment-crossing test, vehicles only. Ref: traffic_rule_checker.py:162-196."""
    bbox_next = jnp.roll(bbox, -1, axis=2)
    # agent bbox edges: [n, a, 1, 4, 2, 2]; road segments: [n, 1, m, 1, 2, 2]
    A = bbox[:, :, None, :, :]  # [n, a, 1, 4, 2]
    B = bbox_next[:, :, None, :, :]
    C = road_edge[:, None, :, None, 0, :]  # [n, 1, m, 1, 2]
    D = road_edge[:, None, :, None, 1, :]
    crossed = (_ccw(A, C, D) != _ccw(B, C, D)) & (_ccw(A, B, C) != _ccw(A, B, D))
    crossed = jnp.any(crossed, axis=-1) & road_edge_valid[:, None, :]  # [n, a, m]
    return jnp.any(crossed, axis=-1) & valid & veh_mask


def _check_run_red_light(
    valid, state, tl_valid, tl_pos, tl_state, rrl_len, rrl_wid, veh_mask
):
    """Stop-point leaves the shrunk-front box. Ref: traffic_rule_checker.py:198-258."""
    c = jnp.cos(state[..., 2])
    s = jnp.sin(state[..., 2])
    heading_f = jnp.stack([c, s], axis=-1)[:, :, None, :]  # [n, a, 1, 2]
    heading_r = jnp.stack([s, -c], axis=-1)[:, :, None, :]

    xy0 = state[..., :2][:, :, None, :]
    xy1 = xy0 + 0.1 * state[..., 3:4][:, :, None, :] * heading_f

    tlp = tl_pos[:, None, :, :]  # [n, 1, t, 2]

    def inside(xy):
        return (jnp.abs(jnp.sum((tlp - xy) * heading_f, axis=-1)) < rrl_len) & (
            jnp.abs(jnp.sum((tlp - xy) * heading_r, axis=-1)) < rrl_wid
        )

    inside_0 = inside(xy0)
    inside_1 = inside(xy1)
    mask_agent = (valid & veh_mask)[:, :, None]
    mask_tl = (tl_valid & tl_state[:, :, 1])[:, None, :]
    return jnp.any(inside_0 & (~inside_1) & mask_agent & mask_tl, axis=-1)


def _check_passive(
    valid, state, passive_counter, tl_valid, tl_pos, tl_state,
    lane_center, lane_center_valid, veh_mask, n_agent_eye,
):
    """Stuck-on-lane detection with counter > 20. Ref: traffic_rule_checker.py:260-335."""
    close = jnp.linalg.norm(state[:, :, None, :2] - lane_center[:, None, :, :], axis=-1) < 2.0
    close_to_lane = jnp.any(close & lane_center_valid[:, None, :], axis=-1)
    low_speed = state[:, :, 3] < 5.0

    heading_f = jnp.stack([jnp.cos(state[..., 2]), jnp.sin(state[..., 2])], axis=-1)[:, :, None, :]

    mask_tl = (tl_valid & jnp.any(tl_state[:, :, (0, 1, 2, 4)], axis=-1))[:, None, :]
    tl_vec = tl_pos[:, None, :, :] - state[:, :, None, :2]
    tl_norm = jnp.linalg.norm(tl_vec, axis=-1)
    tl_close = tl_norm < 10.0
    tl_ahead = jnp.sum(heading_f * tl_vec, axis=-1) / tl_norm > 0.95
    red_ahead = jnp.any(tl_close & tl_ahead & mask_tl, axis=-1)

    agent_vec = state[:, None, :, :2] - state[:, :, None, :2]
    agent_norm = jnp.linalg.norm(agent_vec, axis=-1)
    a_close = agent_norm < 10.0
    a_ahead = jnp.sum(heading_f * agent_vec, axis=-1) / agent_norm > 0.95
    agent_ahead = jnp.any(
        a_close & a_ahead & valid[:, None, :] & valid[:, :, None] & (~n_agent_eye), axis=-1
    )

    passive_now = valid & veh_mask & close_to_lane & low_speed & (~red_ahead) & (~agent_ahead)
    passive_counter = (passive_counter + passive_now) * passive_now
    return passive_counter > 20.0, passive_counter


def _check_goal_reached(valid, state, goal, goal_reached, thresh_pos):
    """Ref: traffic_rule_checker.py:337-361."""
    pos_ok = jnp.linalg.norm(state[..., :2] - goal[..., :2], axis=-1) < thresh_pos
    rot_ok = jnp.abs(cast_rad(state[..., 2] - goal[..., 2])) < GOAL_THRESH_ROT
    return pos_ok & rot_ok & valid & (~goal_reached)


def _check_dest_reached(valid, state, c: RuleConstants, dest_reached):
    """Ref: traffic_rule_checker.py:363-410."""
    dist = jnp.linalg.norm(state[..., :2][:, :, None, :] - c.dest_pos, axis=-1)
    dist = jnp.where(c.dest_valid, dist, 1e4)
    pos_ok = jnp.any(dist < c.dest_thresh_pos[..., None], axis=-1)

    heading_f = jnp.stack([jnp.cos(state[..., 2]), jnp.sin(state[..., 2])], axis=-1)
    rot_diff = jnp.sum(heading_f[:, :, None, :] * c.dest_dir, axis=-1)
    rot_diff = jnp.where(c.dest_valid, rot_diff, 0.0)
    rot_ok = jnp.any(rot_diff > math.cos(DEST_THRESH_ROT), axis=-1)

    mask_lane = jnp.any(c.dest_type[:, :, :4], axis=-1)
    mask_edge = c.dest_type[:, :, 4]
    return (~dest_reached) & valid & ((mask_lane & pos_ok & rot_ok) | (mask_edge & pos_ok))


def check_rules(
    cfg: RuleConfig,
    consts: RuleConstants,
    rs: RuleState,
    valid: jnp.ndarray,  # [n, a] bool, post-update
    state: jnp.ndarray,  # [n, a, 4]
    tl_valid: jnp.ndarray,  # [n, n_tl] this step's slice
    tl_pos: jnp.ndarray,  # [n, n_tl, 2]
    tl_state: jnp.ndarray,  # [n, n_tl, 5]
) -> Tuple[RuleState, Dict[str, jnp.ndarray]]:
    """One rule-check step. Ref: traffic_rule_checker.py:412-516.

    Everything is stop-gradiented (the reference runs under no_grad).
    Returns the updated accumulator state and the 14-key violations dict.
    """
    valid = jax.lax.stop_gradient(valid)
    state = jax.lax.stop_gradient(state)
    bbox = agent_bbox_corners(state, consts.agent_size)

    outside_now = _check_outside_map(valid, state, consts.map_boundary)
    outside = rs.outside_map | outside_now

    if cfg.enable_check_collided:
        collided_now = _check_collided(valid, bbox, consts.collision_invalid_mask)
        collided = rs.collided | collided_now
    else:
        collided_now, collided = rs.collided, rs.collided

    if cfg.enable_check_run_road_edge:
        rre_now = _check_run_road_edge(
            valid, bbox, consts.veh_mask, consts.road_edge, consts.road_edge_valid
        )
        rre = rs.run_road_edge | rre_now
    else:
        rre_now, rre = rs.run_road_edge, rs.run_road_edge

    if cfg.enable_check_run_red_light:
        rrl_now = _check_run_red_light(
            valid, state, tl_valid, tl_pos, tl_state,
            consts.rrl_agent_length, consts.rrl_agent_width, consts.veh_mask,
        )
        rrl = rs.run_red_light | rrl_now
    else:
        rrl_now, rrl = rs.run_red_light, rs.run_red_light

    if cfg.enable_check_passive:
        n_agent = valid.shape[1]
        eye = jnp.eye(n_agent, dtype=bool)[None]
        passive_now, passive_counter = _check_passive(
            valid, state, rs.passive_counter, tl_valid, tl_pos, tl_state,
            consts.lane_center, consts.lane_center_valid, consts.veh_mask, eye,
        )
        passive = rs.passive | passive_now
    else:
        passive_now, passive, passive_counter = rs.passive, rs.passive, rs.passive_counter

    if consts.agent_goal is not None:
        goal_now = _check_goal_reached(
            valid, state, consts.agent_goal, rs.goal_reached, consts.goal_thresh_pos
        )
    else:
        goal_now = jnp.zeros_like(rs.goal_reached)
    goal_reached = rs.goal_reached | goal_now

    if consts.agent_dest is not None:
        dest_now = _check_dest_reached(valid, state, consts, rs.dest_reached)
    else:
        dest_now = jnp.zeros_like(rs.dest_reached)
    dest_reached = rs.dest_reached | dest_now

    new_rs = RuleState(
        outside_map=outside,
        collided=collided,
        run_road_edge=rre,
        run_red_light=rrl,
        passive=passive,
        passive_counter=passive_counter,
        goal_reached=goal_reached,
        dest_reached=dest_reached,
    )
    violations = {
        "outside_map": outside,
        "outside_map_this_step": outside_now,
        "collided": collided,
        "collided_this_step": collided_now,
        "run_road_edge": rre,
        "run_road_edge_this_step": rre_now,
        "run_red_light": rrl,
        "run_red_light_this_step": rrl_now,
        "passive": passive,
        "passive_this_step": passive_now,
        "goal_reached": goal_reached,
        "goal_reached_this_step": goal_now,
        "dest_reached": dest_reached,
        "dest_reached_this_step": dest_now,
    }
    return new_rs, violations
