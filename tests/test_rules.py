"""Tests for the traffic-rule checker (traffic_rule_checker.py in reference)."""
import math

import numpy as np
import jax.numpy as jnp

from trafficbots_tpu.sim import rules as RU


def _scene(n=1, a=2, n_pl=4, n_tl=3):
    rng = np.random.RandomState(0)
    map_valid = np.zeros((n, n_pl, 20), dtype=bool)
    map_valid[:, :, :5] = True
    map_type = np.zeros((n, n_pl, 11), dtype=bool)
    pl_types = [0, 4, 1, 3]  # freeway, road edge, surface street, bike lane
    for i in range(min(n_pl, 4)):
        map_type[:, i, pl_types[i]] = True
    map_pos = rng.uniform(-50, 50, size=(n, n_pl, 20, 2)).astype(np.float32)
    map_dir = np.ones((n, n_pl, 20, 2), dtype=np.float32)
    agent_type = np.zeros((n, a, 3), dtype=bool)
    agent_type[:, :, 0] = True
    agent_size = np.tile(np.array([4.0, 2.0, 1.5], np.float32), (n, a, 1))
    boundary = np.array([[-100.0, 100.0, -100.0, 100.0]] * n, np.float32)
    return dict(
        map_boundary=jnp.asarray(boundary),
        map_valid=jnp.asarray(map_valid),
        map_type=jnp.asarray(map_type),
        map_pos=jnp.asarray(map_pos),
        map_dir=jnp.asarray(map_dir),
        agent_type=jnp.asarray(agent_type),
        agent_size=jnp.asarray(agent_size),
    )


def _tl(n=1, n_tl=3):
    return (
        jnp.zeros((n, n_tl), dtype=bool),
        jnp.zeros((n, n_tl, 2)),
        jnp.zeros((n, n_tl, 5), dtype=bool),
    )


def test_outside_map_and_sticky():
    cfg = RU.RuleConfig()
    sc = _scene()
    consts = RU.init_rule_constants(cfg=cfg, **sc)
    rs = RU.init_rule_state(1, 2)
    tl_v, tl_p, tl_s = _tl()

    state = jnp.asarray(np.array([[[0, 0, 0, 0], [150.0, 0, 0, 0]]], np.float32))
    valid = jnp.ones((1, 2), dtype=bool)
    rs, v = RU.check_rules(cfg, consts, rs, valid, state, tl_v, tl_p, tl_s)
    assert np.asarray(v["outside_map_this_step"]).tolist() == [[False, True]]

    # agent moves back inside; sticky flag must persist
    state2 = jnp.asarray(np.array([[[0, 0, 0, 0], [0.0, 0, 0, 0]]], np.float32))
    rs, v2 = RU.check_rules(cfg, consts, rs, valid, state2, tl_v, tl_p, tl_s)
    assert np.asarray(v2["outside_map_this_step"]).tolist() == [[False, False]]
    assert np.asarray(v2["outside_map"]).tolist() == [[False, True]]


def test_collision_detection():
    cfg = RU.RuleConfig(enable_check_collided=True)
    sc = _scene(a=3)
    consts = RU.init_rule_constants(cfg=cfg, **sc)
    rs = RU.init_rule_state(1, 3)
    tl_v, tl_p, tl_s = _tl()
    # agents 0/1 overlap, agent 2 far away
    state = jnp.asarray(
        np.array([[[0, 0, 0, 0], [1.0, 0.5, 0.3, 0], [50.0, 50, 0, 0]]], np.float32)
    )
    valid = jnp.ones((1, 3), dtype=bool)
    _, v = RU.check_rules(cfg, consts, rs, valid, state, tl_v, tl_p, tl_s)
    assert np.asarray(v["collided_this_step"]).tolist() == [[True, True, False]]


def test_no_ped_ped_collision():
    cfg = RU.RuleConfig(enable_check_collided=True)
    sc = _scene(a=2)
    agent_type = np.zeros((1, 2, 3), dtype=bool)
    agent_type[:, :, 1] = True  # both pedestrians
    sc["agent_type"] = jnp.asarray(agent_type)
    consts = RU.init_rule_constants(cfg=cfg, **sc)
    rs = RU.init_rule_state(1, 2)
    tl_v, tl_p, tl_s = _tl()
    state = jnp.asarray(np.array([[[0, 0, 0, 0], [0.1, 0.1, 0, 0]]], np.float32))
    _, v = RU.check_rules(cfg, consts, rs, jnp.ones((1, 2), bool), state, tl_v, tl_p, tl_s)
    assert not np.asarray(v["collided_this_step"]).any()


def test_run_road_edge():
    cfg = RU.RuleConfig(enable_check_run_road_edge=True)
    sc = _scene(a=1, n_pl=2)
    # place a road-edge segment crossing the agent bbox
    map_pos = np.full((1, 2, 20, 2), 1e3, np.float32)
    map_dir = np.zeros((1, 2, 20, 2), np.float32)
    map_pos[0, 1, 0] = [-5.0, 0.0]
    map_dir[0, 1, 0] = [10.0, 0.0]  # segment (-5,0)->(5,0) through origin
    map_valid = np.zeros((1, 2, 20), dtype=bool)
    map_valid[0, 1, 0] = True
    sc["map_pos"] = jnp.asarray(map_pos)
    sc["map_dir"] = jnp.asarray(map_dir)
    sc["map_valid"] = jnp.asarray(map_valid)
    consts = RU.init_rule_constants(cfg=cfg, **sc)
    rs = RU.init_rule_state(1, 1)
    tl_v, tl_p, tl_s = _tl()
    state = jnp.asarray(np.array([[[0.0, 0.0, math.pi / 2, 0.0]]], np.float32))
    _, v = RU.check_rules(cfg, consts, rs, jnp.ones((1, 1), bool), state, tl_v, tl_p, tl_s)
    assert np.asarray(v["run_road_edge_this_step"]).tolist() == [[True]]


def test_run_red_light():
    cfg = RU.RuleConfig(enable_check_run_red_light=True)
    sc = _scene(a=1)
    consts = RU.init_rule_constants(cfg=cfg, **sc)
    rs = RU.init_rule_state(1, 1)
    n_tl = 3
    tl_valid = jnp.asarray(np.array([[True, False, False]]))
    tl_state = np.zeros((1, n_tl, 5), dtype=bool)
    tl_state[0, 0, 1] = True  # STOP
    # stop point just ahead of a fast agent: inside the oriented box at t,
    # outside at t+dt (box half-length 4*0.5*0.6=1.2; at 40 m/s the box
    # center advances 4 m in 0.1 s)
    tl_pos = np.zeros((1, n_tl, 2), np.float32)
    tl_pos[0, 0] = [1.0, 0.0]
    state = jnp.asarray(np.array([[[0.0, 0.0, 0.0, 40.0]]], np.float32))
    _, v = RU.check_rules(
        cfg, consts, rs, jnp.ones((1, 1), bool), state,
        tl_valid, jnp.asarray(tl_pos), jnp.asarray(tl_state),
    )
    assert np.asarray(v["run_red_light_this_step"]).tolist() == [[True]]


def test_goal_and_dest_reached():
    cfg = RU.RuleConfig()
    sc = _scene(a=1)
    goal = np.array([[[0.5, 0.0, 0.0, 0.0]]], np.float32)[:, 0]
    goal = np.array([[[0.5, 0.0, 0.0, 0.0]]], np.float32).reshape(1, 1, 4)
    dest = np.array([[0]], np.int64)  # polyline 0 = lane
    # lane polyline near the agent, directions aligned with agent heading
    sc["map_pos"] = jnp.asarray(np.zeros((1, 4, 20, 2), np.float32))
    sc["map_dir"] = jnp.asarray(np.tile(np.array([1.0, 0.0], np.float32), (1, 4, 20, 1)))
    consts = RU.init_rule_constants(
        cfg=cfg, agent_goal=jnp.asarray(goal), agent_dest=jnp.asarray(dest), **sc
    )
    rs = RU.init_rule_state(1, 1)
    tl_v, tl_p, tl_s = _tl()
    state = jnp.asarray(np.array([[[0.0, 0.0, 0.05, 1.0]]], np.float32))
    rs, v = RU.check_rules(cfg, consts, rs, jnp.ones((1, 1), bool), state, tl_v, tl_p, tl_s)
    assert np.asarray(v["goal_reached_this_step"]).tolist() == [[True]]
    assert np.asarray(v["dest_reached_this_step"]).tolist() == [[True]]
    # *_this_step only fires once (sticky excluded)
    rs, v2 = RU.check_rules(cfg, consts, rs, jnp.ones((1, 1), bool), state, tl_v, tl_p, tl_s)
    assert np.asarray(v2["goal_reached_this_step"]).tolist() == [[False]]
    assert np.asarray(v2["goal_reached"]).tolist() == [[True]]
    assert np.asarray(v2["dest_reached_this_step"]).tolist() == [[False]]
