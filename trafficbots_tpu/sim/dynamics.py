"""Kinematic action integrators as pure functions over an AgentState pytree.

TPU-native redesign of /root/reference/src/utils/dynamics.py. The reference
holds mutable per-rollout state on a `Dynamics` object and loops over the 3
agent types in Python, masking each type's output; here the per-type
parameters are gathered into [3, ...] tables indexed by the one-hot agent
type, so a single fused fp32 computation covers all agents — bit-identical
to the reference's masked-sum (the type one-hot selects exactly one term,
and 0*x + 1*y + 0*z == y exactly in IEEE754).

Physics is kept in fp32 regardless of the compute dtype used by the neural
network (BASELINE.md demands fp32 bit-parity for the bicycle update, tanh
action squashing and masking semantics).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..distributions import DetType, DiagGaussian
from ..geometry import cast_rad

KIND_MULTIPATHPP = 0  # midpoint-Euler unicycle. Ref: dynamics.py:170-228
KIND_STATE_INTEGRATOR = 1  # vx/vy integrator (TrafficSim). Ref: dynamics.py:231-278


@struct.dataclass
class DynamicsParams:
    """Per-type integrator tables, built once from config (pytree of consts)."""

    action_scale: jnp.ndarray  # [3, 2] tanh output scaling per type
    kind: jnp.ndarray  # [3] int32, KIND_* per type
    disable_neg_spd: jnp.ndarray  # [3] bool
    dt: float = struct.field(pytree_node=False, default=0.1)
    any_state_integrator: bool = struct.field(pytree_node=False, default=False)
    any_multipathpp: bool = struct.field(pytree_node=False, default=True)


def make_dynamics_params(
    veh: Dict, ped: Dict, cyc: Dict, dt: float = 0.1, use_veh_dynamics_for_all: bool = False
) -> DynamicsParams:
    """Build the per-type tables.

    Each of veh/ped/cyc is a dict with key "kind" in {"multipathpp",
    "state_integrator"} plus the integrator kwargs (max_acc/max_yaw_rate/
    disable_neg_spd or max_v). Defaults match configs/model/traffic_bots.yaml:
    140-155 (veh 5/1.5, cyc 6/3, ped 7/7, all MultiPathPP).
    """
    cfgs = [veh, veh, veh] if use_veh_dynamics_for_all else [veh, ped, cyc]
    scale = np.zeros((3, 2), dtype=np.float32)
    kind = np.zeros((3,), dtype=np.int32)
    dns = np.zeros((3,), dtype=bool)
    for i, c in enumerate(cfgs):
        k = c.get("kind", "multipathpp")
        if k == "multipathpp":
            kind[i] = KIND_MULTIPATHPP
            scale[i] = (c.get("max_acc", 4.0), c.get("max_yaw_rate", 1.0))
            dns[i] = c.get("disable_neg_spd", False)
        elif k == "state_integrator":
            kind[i] = KIND_STATE_INTEGRATOR
            scale[i] = (c.get("max_v", 3.0), c.get("max_v", 3.0))
        else:
            raise ValueError(f"unknown dynamics kind {k}")
    return DynamicsParams(
        action_scale=jnp.asarray(scale),
        kind=jnp.asarray(kind),
        disable_neg_spd=jnp.asarray(dns),
        dt=dt,
        any_state_integrator=bool((kind == KIND_STATE_INTEGRATOR).any()),
        any_multipathpp=bool((kind == KIND_MULTIPATHPP).any()),
    )


@struct.dataclass
class AgentState:
    """The mutable part of Dynamics (ref dynamics.py:29-48) as a scan carry."""

    valid: jnp.ndarray  # [n_batch, n_agent] bool
    killed: jnp.ndarray  # [n_batch, n_agent] bool
    state: jnp.ndarray  # [n_batch, n_agent, 4] x,y,yaw,spd
    vel: jnp.ndarray  # [n_batch, n_agent, 2]
    acc: jnp.ndarray  # [n_batch, n_agent, 1]
    yaw_rate: jnp.ndarray  # [n_batch, n_agent, 1]


def init_agent_state(
    valid: jnp.ndarray, state: jnp.ndarray, vel: jnp.ndarray, acc: jnp.ndarray, yaw_rate: jnp.ndarray
) -> AgentState:
    """Ref: dynamics.py:29-48 (frame-0 initialization)."""
    return AgentState(
        valid=valid,
        killed=jnp.zeros_like(valid),
        state=state.astype(jnp.float32),
        vel=vel.astype(jnp.float32),
        acc=acc.astype(jnp.float32),
        yaw_rate=yaw_rate.astype(jnp.float32),
    )


def _update_multipathpp(
    state: jnp.ndarray, acc: jnp.ndarray, yaw_rate: jnp.ndarray, dt: float, disable_neg_spd: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Midpoint-Euler unicycle. Ref: dynamics.py:198-228 (op order preserved).

    state [n,a,4]; acc/yaw_rate [n,a]; disable_neg_spd [n,a] bool.
    Returns (new_state, vel).
    """
    v_tilde = state[:, :, 3] + 0.5 * dt * acc
    theta_tilde = state[:, :, 2] + 0.5 * dt * yaw_rate
    cos_t = jnp.cos(theta_tilde)
    sin_t = jnp.sin(theta_tilde)
    delta = jnp.stack([v_tilde * cos_t, v_tilde * sin_t, yaw_rate, acc], axis=-1)
    new_state = state + dt * delta
    # NB: the reference overwrites the *new* speed with relu of the *old*
    # speed when disable_neg_spd (dynamics.py:222-223); reproduced verbatim.
    new_spd = jnp.where(disable_neg_spd, jax.nn.relu(state[..., 3]), new_state[..., 3])
    new_state = new_state.at[..., 3].set(new_spd)
    vel = (new_state[:, :, :2] - state[:, :, :2]) / dt
    return new_state, vel


def _update_state_integrator(
    state: jnp.ndarray, action: jnp.ndarray, dt: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vx/vy integrator. Ref: dynamics.py:249-278.

    Returns (new_state, vel, acc[n,a], yaw_rate[n,a]).
    """
    vx = action[:, :, 0]
    vy = action[:, :, 1]
    theta = jax.lax.stop_gradient(jnp.arctan2(vy, vx))
    spd = jax.lax.stop_gradient(jnp.linalg.norm(action, axis=-1))
    new_xy = state[..., :2] + action * dt
    new_state = jnp.concatenate([new_xy, theta[..., None], spd[..., None]], axis=-1)
    acc = jax.lax.stop_gradient((spd - state[:, :, 3]) / dt)
    yaw_rate = jax.lax.stop_gradient(cast_rad(theta - state[:, :, 2]) / dt)
    return new_state, action, acc, yaw_rate


def dynamics_update(
    params: DynamicsParams,
    agent: AgentState,
    agent_type: jnp.ndarray,  # [n_batch, n_agent, 3] bool one-hot
    action_dist: DiagGaussian,
    key: jax.Array,
    deterministic: DetType = True,
    action_override: Optional[jnp.ndarray] = None,
    mask_action_override: Optional[jnp.ndarray] = None,
) -> Tuple[AgentState, jnp.ndarray, jnp.ndarray]:
    """One integration step. Ref: dynamics.py:50-119.

    Returns (new AgentState, action [n,a,2], action_log_prob [n,a]).
    """
    type_f = agent_type.astype(jnp.float32)
    valid = agent.valid
    invalid = ~valid

    # sample unbounded action + its log-prob (of the detached sample)
    action_unbounded = action_dist.sample(key, deterministic)
    action_log_prob = action_dist.log_prob(jax.lax.stop_gradient(action_unbounded))
    action_log_prob = jnp.where(invalid, 0.0, action_log_prob)

    # tanh squash scaled by the per-type table; one-hot select is exact
    scale = jnp.einsum("nat,td->nad", type_f, params.action_scale)
    action = jnp.tanh(action_unbounded) * scale
    action = jnp.where(invalid[..., None], 0.0, action)

    if action_override is not None:
        mo = (mask_action_override & valid)[..., None]
        action = jnp.where(mo, action_override, action)

    # per-agent integrator kind (one-hot select over the [3] kind table)
    state = agent.state
    acc_in = action[:, :, 0]
    yawr_in = action[:, :, 1]

    if params.any_multipathpp and params.any_state_integrator:
        dns = jnp.einsum("nat,t->na", type_f, params.disable_neg_spd.astype(jnp.float32)) > 0.5
        s_mpp, v_mpp = _update_multipathpp(state, acc_in, yawr_in, params.dt, dns)
        s_si, v_si, a_si, yr_si = _update_state_integrator(state, action, params.dt)
        kind = jnp.einsum("nat,t->na", type_f, params.kind.astype(jnp.float32)) > 0.5
        new_state = jnp.where(kind[..., None], s_si, s_mpp)
        vel = jnp.where(kind[..., None], v_si, v_mpp)
        acc = jnp.where(kind, a_si, acc_in)[..., None]
        yaw_rate = jnp.where(kind, yr_si, yawr_in)[..., None]
    elif params.any_state_integrator:
        new_state, vel, acc, yaw_rate = _update_state_integrator(state, action, params.dt)
        acc = acc[..., None]
        yaw_rate = yaw_rate[..., None]
    else:
        dns = jnp.einsum("nat,t->na", type_f, params.disable_neg_spd.astype(jnp.float32)) > 0.5
        new_state, vel = _update_multipathpp(state, acc_in, yawr_in, params.dt, dns)
        acc = acc_in[..., None]
        yaw_rate = yawr_in[..., None]

    inv3 = invalid[..., None]
    new_agent = agent.replace(
        state=jnp.where(inv3, 0.0, new_state),
        vel=jnp.where(inv3, 0.0, vel),
        acc=jnp.where(inv3, 0.0, acc),
        yaw_rate=jnp.where(inv3, 0.0, yaw_rate),
    )
    return new_agent, action, action_log_prob


def override_states(
    agent: AgentState,
    state_override: Dict[str, jnp.ndarray],
    mask_state_override: jnp.ndarray,
) -> AgentState:
    """Teacher forcing / agent spawning, branchless. Ref: dynamics.py:121-149.

    state_override keys: "state" [n,a,4], "vel" [n,a,2], "acc"/"yaw_rate" [n,a,1].
    """
    mask = mask_state_override & (~agent.killed)
    m3 = mask[..., None]
    return agent.replace(
        valid=agent.valid | mask,
        state=jnp.where(m3, state_override["state"], agent.state),
        vel=jnp.where(m3, state_override["vel"], agent.vel),
        acc=jnp.where(m3, state_override["acc"], agent.acc),
        yaw_rate=jnp.where(m3, state_override["yaw_rate"], agent.yaw_rate),
    )


def kill(
    agent: AgentState,
    outside_map_this_step: jnp.ndarray,
    gt_valid: Optional[jnp.ndarray] = None,
) -> AgentState:
    """Kill agents that left the map, sparing GT-valid ones. Ref: dynamics.py:151-167."""
    mask_kill = outside_map_this_step
    if gt_valid is not None:
        mask_kill = mask_kill & (~gt_valid)
    mask_kill = jax.lax.stop_gradient(mask_kill)
    return agent.replace(
        killed=agent.killed | mask_kill,
        valid=agent.valid & (~mask_kill),
    )
