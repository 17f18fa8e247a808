"""A/B + on-chip equivalence check for the chunked episode map encode (r5).

`model.map_encode_chunk` partitions the eval-time shared map encoding over
scene sub-batches via lax.map, capping the [B, n_pl, n_node, *] PE /
input-MLP featurization temporaries that dominated the eval program's HBM
peak (batch 256 OOM'd at 24G/15.75G in round 4). The per-scene math is
identical; this tool verifies that on real hardware (valid-masked rollout
predictions vs chunk=0) and times the variants so the default is measured,
not assumed.

Usage: python tools/ab_map_chunk.py [--n-scene 128] [--chunks 0,16,32,64]
Timing methodology per PERF.md: per-iteration D2H scalar read, median of N.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-scene", type=int, default=128)
    ap.add_argument("--n-iter", type=int, default=6)
    ap.add_argument("--chunks", type=str, default="0,16,32,64")
    ap.add_argument("--fill", type=str, default="768,40",
                    help="'n_pl,n_agent' valid-entity counts (WOMD-like default)")
    ap.add_argument("--no-check", action="store_true", help="timing only")
    args = ap.parse_args()

    import jax

    from trafficbots_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("tpu")

    import jax.numpy as jnp

    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu.data.preprocessing import pre_processing
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.run import apply_override
    from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask

    base = ExperimentConfig()
    n_pl, n_ag = (int(x) for x in args.fill.split(","))
    batch_np = synthetic_episode_batch(
        base.data, n_scene=args.n_scene, seed=0, n_valid_pl=n_pl, n_valid_agent=n_ag
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def make_eval_rollout(cfg, model):
        def eval_rollout(params, batch, key):
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
            return buf.preds, buf.valid

        return eval_rollout

    chunks = [int(c) for c in args.chunks.split(",")]
    key = jax.random.PRNGKey(1)
    results = {}
    ref = None
    for chunk in chunks:
        cfg = apply_override(base, "model.map_encode_chunk", str(chunk))
        model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
        rollout = make_eval_rollout(cfg, model)
        if not args.no_check:
            preds, valid = jax.jit(rollout)(params, batch, jax.random.PRNGKey(1))
            masked = np.asarray(preds) * np.asarray(valid)[..., None]
            if ref is None:
                ref = masked
                print(f"chunk={chunk}: reference ({np.abs(masked).sum():.4f} checksum)")
            else:
                diff = np.max(np.abs(masked - ref))
                status = "OK (bit-identical)" if diff == 0.0 else f"max|diff|={diff:.3e}"
                print(f"chunk={chunk}: {status}")
                assert diff < 1e-4, f"chunk={chunk} diverged from unchunked: {diff}"
        fn = jax.jit(lambda params, batch, key: jnp.sum(rollout(params, batch, key)[0]))
        float(fn(params, batch, key))
        float(fn(params, batch, jax.random.fold_in(key, 99)))
        ts = []
        for i in range(args.n_iter):
            t0 = time.perf_counter()
            float(fn(params, batch, jax.random.fold_in(key, i)))
            ts.append(time.perf_counter() - t0)
        ms = sorted(ts)[len(ts) // 2] * 1e3
        n_steps = cfg.time_step_end - cfg.time_step_sim_start + 1
        asps = args.n_scene * cfg.data.n_agent * n_steps / (ms / 1e3)
        results[f"chunk{chunk}"] = {"ms": round(ms, 1), "agent_steps_per_sec": round(asps)}
        print(f"chunk={chunk}", results[f"chunk{chunk}"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
