"""A/B + on-chip equivalence check for the padding-aware kernels (round 3).

Variants:
  off        node-kernel skip off, attention row_block=-1 (round-2 behavior)
  node_skip  node-kernel fully-padded-block skip only (the round-4 DEFAULTS:
             the fill-sensitivity A/B picked it — see PERF.md round 4)
  attn_skip  fused-attention query-block skip only (row_block auto)
  both       both on (the round-3 defaults, regressed at realistic fill)

`--check` runs the eval rollout at a small batch for all variants and
asserts the VALID-agent predictions are bit-identical to `off` — the skip
paths only change dead slots' garbage, which every consumer masks. This is
the real-TPU complement of the interpret-mode unit tests (Mosaic-only bugs
do not reproduce under interpret=True).

Timing methodology per PERF.md: per-iteration device-to-host scalar read
(block_until_ready does not block on the tunnel), median of N.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="equivalence check only")
    ap.add_argument("--n-scene", type=int, default=0)
    ap.add_argument("--n-iter", type=int, default=6)
    ap.add_argument("--dense", action="store_true",
                    help="all agents/polylines valid (padding-sensitivity bound)")
    ap.add_argument("--fill", type=str, default="",
                    help="'n_pl,n_agent' valid-entity counts (e.g. 768,40 for a "
                         "WOMD-like fill between the sparse synthetic default "
                         "and --dense)")
    ap.add_argument("--bucket", action="store_true",
                    help="apply data/bucketing.py host-side capacity slicing "
                         "(timing only; equivalence is pinned by tests/test_bucketing.py). "
                         "agent-steps/s keeps the UNSLICED capacity accounting so the "
                         "number means 'same workload, faster program'.")
    args = ap.parse_args()
    assert not (args.check and args.bucket), "--bucket is timing-only"
    assert not (args.dense and args.bucket), "--bucket has no effect on dense batches"

    import jax

    from trafficbots_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("tpu")

    import jax.numpy as jnp

    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu.data.preprocessing import pre_processing
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.ops import fused_attention as FA
    from trafficbots_tpu.run import apply_override
    from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask

    n_scene = args.n_scene or (16 if args.check else 128)
    base = ExperimentConfig()
    dense_kw = (
        {"n_valid_agent": base.data.n_agent, "n_valid_pl": base.data.n_pl}
        if args.dense else {}
    )
    if args.fill:
        n_pl, n_ag = (int(x) for x in args.fill.split(","))
        dense_kw = {"n_valid_pl": n_pl, "n_valid_agent": n_ag}
    batch_np = synthetic_episode_batch(base.data, n_scene=n_scene, seed=0, **dense_kw)
    if args.bucket:
        from trafficbots_tpu.data.bucketing import bucket_slice

        batch_np, buckets = bucket_slice(batch_np)
        print("bucketed capacities:", buckets)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def make_eval_rollout(cfg, model):
        """The ONE rollout recipe both the --check and timing paths jit —
        a single definition so they cannot drift apart."""

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

    def make_cfg_params(node_skip: bool, attn_skip: bool):
        """Config + params under the variant's overrides. The row-block
        override is a TRACE-time hook: it must stay set while any program
        for this variant is traced."""
        cfg = apply_override(
            base, "model.map_encoder.fused_skip_invalid_blocks", str(node_skip).lower()
        )
        # round-4 defaults made row_block=-1 (skip off) the plumbed value, so
        # the attn_skip variant must FORCE the auto skip-granular blocking
        FA._ROW_BLOCK_OVERRIDE = 0 if attn_skip else -1
        model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
        return cfg, model, params

    # (the round-3 flash kv-block variants are gone: the path lost the A/B at
    # every fill and was removed from ops/fused_attention.py in round 4)
    variants = [
        ("off", False, False),
        ("node_skip", True, False),
        ("attn_skip", False, True),
        ("both", True, True),
    ]

    if args.check:
        ref = None
        for name, ns, ak in variants:
            cfg, model, params = make_cfg_params(ns, ak)
            # NOTE: trace happens inside this call, while the override is set
            preds, valid = jax.jit(make_eval_rollout(cfg, model))(
                params, batch, jax.random.PRNGKey(1)
            )
            p = np.asarray(preds)
            v = np.asarray(valid)
            masked = p * v[..., None]
            if ref is None:
                ref = masked
                print(f"{name}: reference ({np.abs(masked).sum():.4f} checksum)")
            else:
                diff = np.max(np.abs(masked - ref))
                status = "OK (bit-identical)" if diff == 0.0 else f"max|diff|={diff:.3e}"
                print(f"{name}: {status}")
                assert diff < 1e-5, f"{name} diverged from off: {diff}"
        print("equivalence check passed")
        return

    import json

    results = {}
    key = jax.random.PRNGKey(1)
    for name, ns, ak in variants:
        cfg, model, params = make_cfg_params(ns, ak)
        rollout = make_eval_rollout(cfg, model)
        # D2H-sync methodology: reduce to one scalar read per iteration
        # (the only program this variant compiles/executes in timing mode)
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
        asps = n_scene * cfg.data.n_agent * n_steps / (ms / 1e3)
        results[name] = {"ms": round(ms, 1), "agent_steps_per_sec": round(asps)}
        print(name, results[name])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
