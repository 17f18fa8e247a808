"""Golden tests for the kinematic integrators (fp32 parity with the reference
formulas, SURVEY.md section 4 item 2: dynamics.py:170-278)."""
import numpy as np
import jax
import jax.numpy as jnp

from trafficbots_tpu.distributions import DiagGaussian
from trafficbots_tpu.sim import dynamics as D


def _default_params():
    return D.make_dynamics_params(
        veh={"kind": "multipathpp", "max_acc": 5, "max_yaw_rate": 1.5},
        ped={"kind": "multipathpp", "max_acc": 7, "max_yaw_rate": 7},
        cyc={"kind": "multipathpp", "max_acc": 6, "max_yaw_rate": 3},
        dt=0.1,
    )


def _numpy_multipathpp(state, acc, yaw_rate, dt):
    """Independent numpy golden of the midpoint-Euler unicycle (dynamics.py:198-228)."""
    v_tilde = state[..., 3] + 0.5 * dt * acc
    theta_tilde = state[..., 2] + 0.5 * dt * yaw_rate
    delta = np.stack(
        [v_tilde * np.cos(theta_tilde), v_tilde * np.sin(theta_tilde), yaw_rate, acc], axis=-1
    )
    new_state = state + dt * delta
    vel = (new_state[..., :2] - state[..., :2]) / dt
    return new_state, vel


def test_multipathpp_update_golden():
    rng = np.random.RandomState(0)
    state = rng.uniform(-10, 10, size=(2, 4, 4)).astype(np.float32)
    acc = rng.uniform(-5, 5, size=(2, 4)).astype(np.float32)
    yawr = rng.uniform(-1, 1, size=(2, 4)).astype(np.float32)
    dns = np.zeros((2, 4), dtype=bool)
    new_state, vel = D._update_multipathpp(
        jnp.asarray(state), jnp.asarray(acc), jnp.asarray(yawr), 0.1, jnp.asarray(dns)
    )
    exp_state, exp_vel = _numpy_multipathpp(state, acc, yawr, 0.1)
    np.testing.assert_allclose(np.asarray(new_state), exp_state, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vel), exp_vel, rtol=1e-5, atol=1e-4)


def test_tanh_action_scaling_per_type():
    """Action scale selected by one-hot type must equal per-type tanh squash."""
    params = _default_params()
    n, a = 1, 3
    agent_type = np.zeros((n, a, 3), dtype=bool)
    agent_type[0, 0, 0] = True  # veh
    agent_type[0, 1, 1] = True  # ped
    agent_type[0, 2, 2] = True  # cyc

    mean = jnp.asarray(np.full((n, a, 2), 0.7, dtype=np.float32))
    dist = DiagGaussian(mean=mean, log_std=jnp.asarray(np.float32(-2.0)))
    agent = D.init_agent_state(
        valid=jnp.ones((n, a), dtype=bool),
        state=jnp.zeros((n, a, 4)),
        vel=jnp.zeros((n, a, 2)),
        acc=jnp.zeros((n, a, 1)),
        yaw_rate=jnp.zeros((n, a, 1)),
    )
    new_agent, action, logp = D.dynamics_update(
        params, agent, jnp.asarray(agent_type), dist, jax.random.PRNGKey(0), deterministic=True
    )
    t = np.tanh(0.7)
    expected = np.array(
        [[[t * 5, t * 1.5], [t * 7, t * 7], [t * 6, t * 3]]], dtype=np.float32
    )
    np.testing.assert_allclose(np.asarray(action), expected, rtol=1e-5)
    # deterministic logp = logpdf of the mean = -sum(log_std) - log(2pi)
    expected_logp = 2 * (2.0 - 0.5 * np.log(2 * np.pi))
    np.testing.assert_allclose(np.asarray(logp), expected_logp, rtol=1e-5)


def test_invalid_agents_zeroed():
    params = _default_params()
    valid = jnp.asarray(np.array([[True, False]]))
    agent_type = jnp.asarray(np.tile(np.array([True, False, False]), (1, 2, 1)))
    agent = D.init_agent_state(
        valid=valid,
        state=jnp.ones((1, 2, 4)),
        vel=jnp.ones((1, 2, 2)),
        acc=jnp.ones((1, 2, 1)),
        yaw_rate=jnp.ones((1, 2, 1)),
    )
    dist = DiagGaussian(mean=jnp.ones((1, 2, 2)), log_std=jnp.float32(-2.0))
    new_agent, action, logp = D.dynamics_update(
        params, agent, agent_type, dist, jax.random.PRNGKey(0)
    )
    assert np.asarray(new_agent.state)[0, 1].sum() == 0
    assert np.asarray(action)[0, 1].sum() == 0
    assert np.asarray(logp)[0, 1] == 0
    assert np.asarray(new_agent.state)[0, 0].sum() != 0


def test_override_and_kill_semantics():
    params = _default_params()
    valid = jnp.asarray(np.array([[True, False, True]]))
    agent = D.init_agent_state(
        valid=valid,
        state=jnp.zeros((1, 3, 4)),
        vel=jnp.zeros((1, 3, 2)),
        acc=jnp.zeros((1, 3, 1)),
        yaw_rate=jnp.zeros((1, 3, 1)),
    )
    # kill agent 2 (no gt), agent 0 spared by gt_valid
    outside = jnp.asarray(np.array([[True, False, True]]))
    gt_valid = jnp.asarray(np.array([[True, False, False]]))
    agent = D.kill(agent, outside, gt_valid)
    assert np.asarray(agent.valid).tolist() == [[True, False, False]]
    assert np.asarray(agent.killed).tolist() == [[False, False, True]]

    # spawn agent 1 via override; killed agent 2 must NOT be revived
    override = {
        "state": jnp.ones((1, 3, 4)) * 7.0,
        "vel": jnp.ones((1, 3, 2)) * 2.0,
        "acc": jnp.ones((1, 3, 1)),
        "yaw_rate": jnp.ones((1, 3, 1)),
    }
    mask = jnp.asarray(np.array([[False, True, True]]))
    agent = D.override_states(agent, override, mask)
    assert np.asarray(agent.valid).tolist() == [[True, True, False]]
    np.testing.assert_allclose(np.asarray(agent.state)[0, 1], 7.0)
    np.testing.assert_allclose(np.asarray(agent.state)[0, 0], 0.0)  # untouched
    np.testing.assert_allclose(np.asarray(agent.state)[0, 2], 0.0)  # killed, not overridden


def test_state_integrator_golden():
    params = D.make_dynamics_params(
        veh={"kind": "multipathpp", "max_acc": 5, "max_yaw_rate": 1.5},
        ped={"kind": "state_integrator", "max_v": 3},
        cyc={"kind": "multipathpp", "max_acc": 6, "max_yaw_rate": 3},
        dt=0.1,
    )
    assert params.any_state_integrator and params.any_multipathpp
    n, a = 1, 2
    agent_type = np.zeros((n, a, 3), dtype=bool)
    agent_type[0, 0, 0] = True  # veh -> multipathpp
    agent_type[0, 1, 1] = True  # ped -> state integrator
    state0 = np.array([[[1.0, 2.0, 0.5, 3.0], [0.0, 0.0, 0.0, 1.0]]], dtype=np.float32)
    agent = D.init_agent_state(
        valid=jnp.ones((n, a), dtype=bool),
        state=jnp.asarray(state0),
        vel=jnp.zeros((n, a, 2)),
        acc=jnp.zeros((n, a, 1)),
        yaw_rate=jnp.zeros((n, a, 1)),
    )
    mean = jnp.asarray(np.full((n, a, 2), 0.3, dtype=np.float32))
    dist = DiagGaussian(mean=mean, log_std=jnp.float32(-2.0))
    new_agent, action, _ = D.dynamics_update(
        params, agent, jnp.asarray(agent_type), dist, jax.random.PRNGKey(0)
    )
    t = np.tanh(np.float32(0.3))
    # ped: vx=vy=t*3, new xy = old + v*dt, theta=atan2, spd=|v|
    v = t * 3
    exp_ped = np.array([0.1 * v, 0.1 * v, np.arctan2(v, v), np.hypot(v, v)], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(new_agent.state)[0, 1], exp_ped, rtol=1e-4)
    # veh follows multipathpp
    exp_veh, _ = _numpy_multipathpp(state0[:, 0], np.array([t * 5]), np.array([t * 1.5]), 0.1)
    np.testing.assert_allclose(np.asarray(new_agent.state)[0, 0], exp_veh[0], rtol=1e-4)
