"""North-star benchmark: 91-step closed-loop rollout agent-steps/sec/chip.

Runs the full-scale flagship model (64 agents, 1024 polylines, hidden 128,
91 steps; ref data_h5_womd.py:78-84) in eval mode (reactive replay with
posterior latent, deterministic) as one jitted program on the available
chip, and reports agent-steps/sec = batch * n_agent * n_rollout_steps / t.

The headline `value` is measured at a WOMD-like validity fill (768/1024
polylines, 40/64 agents real) so data-sparsity levers cannot inflate it;
the sparse synthetic fill (128 pl / 16 agents) is reported alongside as
`sparse_fill_agent_steps_per_sec`. Both run the SAME compiled program —
fill only changes validity-mask data.

Timing note: the result is reduced to a scalar checksum and pulled to the
host every iteration — on the TPU-tunnel backend `block_until_ready()` does
NOT actually block, so only a device-to-host read gives honest wall-clock.
Median of n_iter runs is reported.

vs_baseline compares against the reference's implied rollout throughput on
its eval hardware (1x RTX 2080 Ti, README.md:36). The reference publishes no
wall-clock numbers (BASELINE.md); the baseline constant below is an estimate
derived from the reference's published training setup: batch 4/GPU with a
90-step Python-stepped rollout and per-step model of ~6 cross-attn layers
over 64x(1024+100) tokens at fp16 — ~25k agent-steps/sec for a forward-only
rollout. tools/bench_torch_reference.py grounds the estimate by timing the
living reference on this host's CPU (836 agent-steps/s single-thread);
BASELINE.md documents the CPU->2080 Ti extrapolation band and why 25k
remains the headline divisor (conservative end of the band).

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_AGENT_STEPS_PER_SEC_2080TI = 25_000.0


def main():
    import jax

    # persistent compilation cache: the full-scale eval+train programs take
    # minutes to compile over the tunnel; cached, a bench run is seconds
    from trafficbots_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("tpu")

    import jax.numpy as jnp

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.data.preprocessing import pre_processing
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask

    # batch 384: throughput rises with batch as the fixed per-program dispatch
    # cost amortizes, with the knee at 384 (round-5 WOMD-fill scaling on
    # v5e: 2.37M @ 128, 2.42M @ 192, 2.49/2.43M @ 256, 2.51/2.48M @ 384,
    # 2.42M @ 512 — anything past 128 only compiles since the round-5
    # episode-featurization layout fix + chunked map encode; PERF.md round 5)
    n_scene = int(os.environ.get("BENCH_N_SCENE", "384"))
    n_iter = int(os.environ.get("BENCH_N_ITER", "8"))
    cfg = ExperimentConfig(precision=os.environ.get("BENCH_PRECISION", "fp32"))
    # HEADLINE batch: WOMD-like fill (768/1024 polylines, 40/64 agents valid
    # — matching real packed-scenario occupancy) so padding-skip levers
    # cannot overstate the number (round-3 lesson: the sparse synthetic
    # default, 128 pl/16 agents valid, flattered block-skip variants by up
    # to 1.6x; see PERF.md round-4 fill-sensitivity table). The sparse fill
    # is still measured and reported as a secondary key — same compiled
    # program, validity masks are data.
    batch_np = synthetic_episode_batch(
        cfg.data, n_scene=n_scene, seed=0, n_valid_pl=768, n_valid_agent=40
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    sparse_np = synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=0)
    sparse = {k: jnp.asarray(v) for k, v in sparse_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)

    def eval_rollout(params, batch, key):
        # val semantics (history/* views), matching the real validate path
        pbatch = pre_processing(batch, cfg.model, training=False)
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
        # scalar checksum: the only honest sync point over the device tunnel
        return jnp.sum(buf.preds)

    fn = jax.jit(eval_rollout)
    key = jax.random.PRNGKey(1)

    # warmup (compile) + one steady-state warm call
    float(fn(params, batch, key))
    float(fn(params, batch, jax.random.fold_in(key, 999)))

    n_steps = cfg.time_step_end - cfg.time_step_sim_start + 1

    def timed_asps(b):
        times = []
        for i in range(n_iter):
            t0 = time.perf_counter()
            v = float(fn(params, b, jax.random.fold_in(key, i)))  # D2H sync
            times.append(time.perf_counter() - t0)
        assert np.isfinite(v)
        dt = sorted(times)[len(times) // 2]
        return n_scene * cfg.data.n_agent * n_steps / dt

    agent_steps_per_sec = timed_asps(batch)
    float(fn(params, sparse, key))  # steady-state warm call on the new data
    sparse_asps = timed_asps(sparse)

    # ---- training-step throughput (forward + BPTT backward through the
    # 90-step scan with per-step remat + Adam), the 5-days-on-6-GPUs path.
    # Guarded so a train-path regression cannot zero out the headline metric.
    train_ms = train_asps = -1.0
    if os.environ.get("BENCH_TRAIN", "1").lower() in ("1", "true"):
        try:
            import optax

            from trafficbots_tpu.training.train import make_optimizer, make_train_step

            # batch 64: round-5 WOMD-fill A/B: 278.5k agent-steps/s @ 32,
            # 305.2k @ 64 (+9.6%); 128 OOMs the 16G chip (18.8G program —
            # BPTT residuals scale with batch even under save_attn remat).
            n_scene_t = int(os.environ.get("BENCH_TRAIN_N_SCENE", "64"))
            # same WOMD-like fill as the headline (round-4 honesty rule)
            tb_np = synthetic_episode_batch(
                cfg.data, n_scene=n_scene_t, seed=1,
                n_valid_pl=768, n_valid_agent=40,
            )
            tb = {k: jnp.asarray(v) for k, v in tb_np.items()}
            tx = make_optimizer(cfg, params)
            opt_state = tx.init(params)
            tstep = jax.jit(make_train_step(cfg, model, tx))
            p2, o2, m = tstep(params, opt_state, tb, key)
            float(m["loss"])  # compile + sync
            tt = []
            for i in range(int(os.environ.get("BENCH_TRAIN_N_ITER", "5"))):
                t0 = time.perf_counter()
                p2, o2, m = tstep(p2, o2, tb, jax.random.fold_in(key, 100 + i))
                float(m["loss"])  # D2H sync
                tt.append(time.perf_counter() - t0)
            train_ms = sorted(tt)[len(tt) // 2] * 1e3
            train_asps = n_scene_t * cfg.data.n_agent * n_steps / (train_ms / 1e3)
        except Exception as e:  # keep the headline metric alive, but visibly
            import sys
            import traceback

            print(
                f"bench: train path FAILED ({type(e).__name__}: {e}); "
                "reporting train_step_ms=-1",
                file=sys.stderr,
            )
            traceback.print_exc(file=sys.stderr)

    print(json.dumps({
        "metric": "rollout_agent_steps_per_sec_per_chip",
        "value": round(agent_steps_per_sec, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(agent_steps_per_sec / BASELINE_AGENT_STEPS_PER_SEC_2080TI, 3),
        "fill": "womd_like_768pl_40agents",
        "sparse_fill_agent_steps_per_sec": round(sparse_asps, 1),
        "train_step_ms": round(train_ms, 1),
        "train_agent_steps_per_sec": round(train_asps, 1),
    }))


if __name__ == "__main__":
    main()
