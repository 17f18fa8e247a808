"""North-star benchmark: 91-step closed-loop rollout agent-steps/sec/chip.

Runs the full-scale flagship model (64 agents, 1024 polylines, hidden 128,
91 steps; ref data_h5_womd.py:78-84) in eval mode (reactive replay with
posterior latent, deterministic) as one jitted program on the available
chip, and reports agent-steps/sec = batch * n_agent * n_rollout_steps / t.

vs_baseline compares against the reference's implied rollout throughput on
its eval hardware (1x RTX 2080 Ti, README.md:36). The reference publishes no
wall-clock numbers (BASELINE.md); the baseline constant below is an estimate
derived from the reference's published training setup: batch 4/GPU with a
90-step Python-stepped rollout and per-step model of ~6 cross-attn layers
over 64x(1024+100) tokens at fp16 — ~25k agent-steps/sec for a forward-only
rollout. Revisit when a measured torch baseline becomes available.

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_AGENT_STEPS_PER_SEC_2080TI = 25_000.0


def main():
    import jax
    import jax.numpy as jnp

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.data.preprocessing import pre_processing
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask

    n_scene = 8
    cfg = ExperimentConfig()
    batch_np = synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)

    def eval_rollout(params, batch, key):
        pbatch = pre_processing(batch, cfg.model, training=True)
        feats = O.encode_episode_features(model, params, pbatch, training=False, key=None)
        goal_gt, goal_valid = O.get_gt_goal(
            cfg, pbatch["input/agent_valid"], pbatch["gt/goal"], pbatch["gt/dest"]
        )
        latent_post = model.apply(
            {"params": params}, method="latent", posterior=True, **feats["latent_post"]
        )
        mask_tf = teacher_forcing_mask(
            O.tf_cfg_to_sim(cfg.tf_reactive_replay), pbatch["gt/valid"]
        )
        buf = O.reactive_replay(
            cfg, model, params, pbatch, feats["input"], latent_post,
            goal_gt, goal_valid, mask_tf, key,
            deterministic_latent=True, deterministic_action=True,
        )
        return buf.preds

    fn = jax.jit(eval_rollout)
    key = jax.random.PRNGKey(1)

    # warmup (compile)
    out = fn(params, batch, key)
    out.block_until_ready()

    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = fn(params, batch, jax.random.fold_in(key, i))
    out.block_until_ready()
    t1 = time.perf_counter()

    dt = (t1 - t0) / n_iter
    n_steps = cfg.time_step_end - cfg.time_step_sim_start + 1
    agent_steps_per_sec = n_scene * cfg.data.n_agent * n_steps / dt

    print(json.dumps({
        "metric": "rollout_agent_steps_per_sec_per_chip",
        "value": round(agent_steps_per_sec, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(agent_steps_per_sec / BASELINE_AGENT_STEPS_PER_SEC_2080TI, 3),
    }))


if __name__ == "__main__":
    main()
