"""Traffic-rule-checker parity vs the living torch reference.

Drives /root/reference/src/utils/traffic_rule_checker.py and our pure
sim/rules.py over the same synthetic episode (all checks enabled) and
asserts every violation key matches at every step — including the stateful
accumulators (passive counter, sticky flags).
"""
import numpy as np
import pytest

import ref_compat  # noqa: F401

import jax.numpy as jnp
import torch

from ref_compat import t2n

from trafficbots_tpu.config import DataConfig
from trafficbots_tpu.data.synthetic import synthetic_episode_batch
from trafficbots_tpu.sim import rules as RU


def _scene(seed=0, n_scene=2):
    data = DataConfig(n_step=31, n_agent=8, n_agent_no_sim=8,
                      n_pl=16, n_pl_node=10, n_tl=6, n_tl_stop=6)
    b = synthetic_episode_batch(data, n_scene=n_scene, seed=seed)

    # engineer violations so the comparison is not vacuous:
    # - agents 0/1 overlap from step 5 (collision)
    b["agent/pos"][:, 5:, 1] = b["agent/pos"][:, 5:, 0]
    b["agent/yaw_bbox"][:, 5:, 1] = b["agent/yaw_bbox"][:, 5:, 0]
    # - agent 0 stops moving after step 8 (passive candidate)
    b["agent/pos"][:, 8:, 0] = b["agent/pos"][:, 8:1 + 8, 0]
    b["agent/spd"][:, 8:, 0] = 0.0
    # - agent 2 leaves the map at step 10
    b["agent/pos"][:, 10:, 2] = np.asarray(b["map/boundary"][:, 1])[:, None, None] + 50.0
    # - goal at agent 3's step-6 pose (goal_reached), valid everywhere
    b["agent/goal"][:, 3, :2] = b["agent/pos"][:, 6, 3]
    b["agent/goal"][:, 3, 2] = b["agent/yaw_bbox"][:, 6, 3, 0]
    b["agent/valid"][:] = True
    return b


@pytest.mark.parametrize("seed", [0, 1])
def test_rule_checker_full_parity(seed):
    from utils.traffic_rule_checker import TrafficRuleChecker

    b = _scene(seed)
    T = 31

    def tt(x):
        return torch.from_numpy(np.asarray(x))

    ref = TrafficRuleChecker(
        map_boundary=tt(b["map/boundary"]).float(),
        map_valid=tt(b["map/valid"]),
        map_type=tt(b["map/type"]),
        map_pos=tt(b["map/pos"]).float(),
        map_dir=tt(b["map/dir"]).float(),
        tl_stop_valid=tt(b["tl_stop/valid"]),
        tl_stop_pos=tt(b["tl_stop/pos"]).float(),
        tl_stop_state=tt(b["tl_stop/state"]),
        agent_type=tt(b["agent/type"]),
        agent_size=tt(b["agent/size"]).float(),
        agent_goal=tt(b["agent/goal"]).float(),
        agent_dest=tt(b["agent/dest"]).long(),
        enable_check_collided=True,
        enable_check_run_road_edge=True,
        enable_check_run_red_light=True,
        enable_check_passive=True,
        collision_size_scale=1.1,
    )

    cfg = RU.RuleConfig(
        enable_check_collided=True, enable_check_run_road_edge=True,
        enable_check_run_red_light=True, enable_check_passive=True,
        collision_size_scale=1.1,
    )
    consts = RU.init_rule_constants(
        map_boundary=jnp.asarray(b["map/boundary"], jnp.float32),
        map_valid=jnp.asarray(b["map/valid"]),
        map_type=jnp.asarray(b["map/type"]),
        map_pos=jnp.asarray(b["map/pos"]),
        map_dir=jnp.asarray(b["map/dir"]),
        agent_type=jnp.asarray(b["agent/type"]),
        agent_size=jnp.asarray(b["agent/size"]),
        agent_goal=jnp.asarray(b["agent/goal"]),
        agent_dest=jnp.asarray(b["agent/dest"]),
        cfg=cfg,
    )
    rs = RU.init_rule_state(*b["agent/valid"].shape[::2])

    fired = set()
    T_tl = b["tl_stop/valid"].shape[1]
    for step in range(1, T):
        valid = b["agent/valid"][:, step]
        state = np.concatenate(
            [b["agent/pos"][:, step], b["agent/yaw_bbox"][:, step], b["agent/spd"][:, step]],
            axis=-1,
        ).astype(np.float32)

        r_viol = ref.check(step, tt(valid), tt(state).float())
        tl_step = min(step, T_tl - 1)
        rs, o_viol = RU.check_rules(
            cfg, consts, rs, jnp.asarray(valid), jnp.asarray(state),
            jnp.asarray(b["tl_stop/valid"][:, tl_step]),
            jnp.asarray(b["tl_stop/pos"][:, tl_step]),
            jnp.asarray(b["tl_stop/state"][:, tl_step]),
        )
        for k, rv in r_viol.items():
            assert k in o_viol, f"missing violation key {k}"
            np.testing.assert_array_equal(
                np.asarray(o_viol[k]), t2n(rv), err_msg=f"step {step}: {k}"
            )
            if t2n(rv).any():
                fired.add(k.replace("_this_step", ""))

    # the engineered scene must actually exercise the interesting checks
    for k in ("collided", "outside_map", "goal_reached"):
        assert k in fired, f"scene never triggered {k}; test is vacuous"
