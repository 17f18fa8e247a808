"""Decompose the 90-step rollout scan cost by stubbing stages (scratch).

Monkeypatches individual stages of the scan body with shape-preserving
no-ops and times the resulting program on the real chip:
  - full          : unmodified reactive replay
  - no_rules      : rule checker replaced by constant no-violations
  - no_reward     : differentiable reward replaced by zeros
  - no_featurize  : per-step agent re-featurization replaced by zeros
  - no_policy     : the whole policy network replaced by zeros (sim floor)
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import numpy as np


def timed(fn, args, n=6):
    import jax

    f = jax.jit(fn)
    float(np.asarray(f(*args)).ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.data.preprocessing import pre_processing
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.sim import rollout as RO
    from trafficbots_tpu.sim import rules as RU
    from trafficbots_tpu.sim import rewards as RW
    from trafficbots_tpu.data import preprocessing as PP

    n_scene = 32
    cfg = ExperimentConfig()
    batch_np = synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    pbatch = jax.jit(lambda b: pre_processing(b, cfg.model, training=False))(batch)
    feats = jax.jit(
        lambda p, b: O.encode_episode_features(model, p, b, training=False, key=None)
    )(params, pbatch)
    lat = jax.jit(
        lambda p, f: model.apply({"params": p}, method="latent", posterior=True, **f["latent_post"])
    )(params, feats)
    goal_gt, goal_valid = O.get_gt_goal(
        cfg, pbatch["input/agent_valid"], pbatch["gt/goal"], pbatch["gt/dest"]
    )
    from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask

    mask_tf = teacher_forcing_mask(O.tf_cfg_to_sim(cfg.tf_reactive_replay), pbatch["gt/valid"])

    def f_roll(params, pbatch, feats, lat):
        buf = O.reactive_replay(
            cfg, model, params, pbatch, feats["input"], lat,
            goal_gt, goal_valid, mask_tf, key,
            deterministic_latent=True, deterministic_action=True,
        )
        return jnp.sum(buf.preds)

    out = {}
    out["full_ms"] = timed(f_roll, (params, pbatch, feats, lat))

    # ---- no rules
    orig_check = RO.check_rules

    def stub_rules(rcfg, consts, rs, valid, state, tlv, tlp, tls):
        z = jnp.zeros_like(valid)
        viol = {k: z for k in (
            "outside_map", "outside_map_this_step", "collided", "collided_this_step",
            "run_road_edge", "run_road_edge_this_step", "run_red_light",
            "run_red_light_this_step", "passive", "passive_this_step",
            "goal_reached", "goal_reached_this_step", "dest_reached", "dest_reached_this_step",
        )}
        return rs, viol

    RO.check_rules = stub_rules
    out["no_rules_ms"] = timed(f_roll, (params, pbatch, feats, lat))
    RO.check_rules = orig_check

    # ---- no reward
    orig_rew = RO.differentiable_reward

    def stub_reward(rcfg, pv, ps, gv, gs, size):
        return jnp.zeros_like(pv, dtype=jnp.float32), pv

    RO.differentiable_reward = stub_reward
    out["no_reward_ms"] = timed(f_roll, (params, pbatch, feats, lat))
    RO.differentiable_reward = orig_rew

    # ---- no per-step featurization
    orig_feat = RO.agent_attr_and_pe

    def stub_feat(mcfg, pos, yaw, vel, spd, yr, acc, size, atype):
        B, A = pos.shape[:2]
        from trafficbots_tpu.geometry import pose_pe_out_dim

        pe_d = pose_pe_out_dim(mcfg.pose_pe_agent, mcfg.pe_dim)
        return jnp.zeros((B, A, 11)), jnp.zeros((B, A, pe_d))

    RO.agent_attr_and_pe = stub_feat
    out["no_featurize_ms"] = timed(f_roll, (params, pbatch, feats, lat))
    RO.agent_attr_and_pe = orig_feat

    # ---- no policy network (sim floor): policy_step returns zeros
    from trafficbots_tpu.models.traffic_bots import TrafficBots

    orig_policy = TrafficBots.policy_step

    def stub_policy(self, agent_valid, agent_feature, map_valid, map_feature,
                    tl_valid, tl_feature, goal_valid, goal_feature, latent_sample,
                    hidden, agent_type, need_weights=False, deterministic=True,
                    map_kv=None, goal_z_pre=None, latent_z_pre=None):
        B, A = agent_valid.shape
        z2 = jnp.zeros((B, A, 2))
        return z2, z2, hidden, jnp.zeros((B, A, self.cfg.hidden_dim)), {}

    TrafficBots.policy_step = stub_policy
    out["no_policy_ms"] = timed(f_roll, (params, pbatch, feats, lat))
    TrafficBots.policy_step = orig_policy

    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
