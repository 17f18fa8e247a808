"""Phase-level timing of the eval program on the real chip (D2H-synced).

Not part of the framework — a scratch profiling harness for PERF.md work.
Times each stage of bench.py's eval_rollout separately: pre-processing, map
encode, other encoders, latent, rollout scan.
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
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
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.data.preprocessing import pre_processing, extract
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask

    n_scene = int(os.environ.get("BENCH_N_SCENE", "32"))
    cfg = ExperimentConfig()
    # FILL=768,40 measures at a WOMD-like validity fill (round-4 honesty rule)
    fill = os.environ.get("FILL", "")
    fill_kw = {}
    if fill:
        n_pl, n_ag = (int(x) for x in fill.split(","))
        fill_kw = dict(n_valid_pl=n_pl, n_valid_agent=n_ag)
    batch_np = synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=0, **fill_kw)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    out = {}

    # 1. pre-processing alone
    def f_pre(batch):
        pb = pre_processing(batch, cfg.model, training=True)
        return sum(jnp.sum(v) for k, v in pb.items() if k.startswith("input/") and v.dtype != bool)

    out["pre_ms"] = timed(f_pre, (batch,)) * 1e3

    pbatch = jax.jit(lambda b: pre_processing(b, cfg.model, training=True))(batch)
    pbatch = jax.tree.map(lambda x: x, pbatch)

    # 2. map encoder alone
    def f_map(params, pbatch):
        mf, mv = model.apply(
            {"params": params}, method="map_only",
            map_valid=pbatch["input/map_valid"], map_attr=pbatch["input/map_attr"],
            map_pe=pbatch["input/map_pe"],
        )
        return jnp.sum(mf)

    out["map_ms"] = timed(f_map, (params, pbatch)) * 1e3

    # 3. all three encoder views (with shared map)
    def f_enc(params, pbatch):
        feats = O.encode_episode_features(model, params, pbatch, training=False, key=None)
        return jnp.sum(feats["input"]["agent_feature"])

    out["encode_all_ms"] = timed(f_enc, (params, pbatch)) * 1e3

    feats = jax.jit(
        lambda p, b: O.encode_episode_features(model, p, b, training=False, key=None)
    )(params, pbatch)

    # 4. latent posterior
    def f_lat(params, feats):
        lat = model.apply({"params": params}, method="latent", posterior=True, **feats["latent_post"])
        return jnp.sum(lat.mean)

    out["latent_ms"] = timed(f_lat, (params, feats)) * 1e3

    # 5. rollout scan alone (fixed latent/goal)
    lat = jax.jit(
        lambda p, f: model.apply({"params": p}, method="latent", posterior=True, **f["latent_post"])
    )(params, feats)
    goal_gt, goal_valid = O.get_gt_goal(cfg, pbatch["input/agent_valid"], pbatch["gt/goal"], pbatch["gt/dest"])
    mask_tf = teacher_forcing_mask(O.tf_cfg_to_sim(cfg.tf_reactive_replay), pbatch["gt/valid"])

    def f_roll(params, pbatch, feats, lat):
        buf = O.reactive_replay(
            cfg, model, params, pbatch, feats["input"], lat,
            goal_gt, goal_valid, mask_tf, key,
            deterministic_latent=True, deterministic_action=True,
        )
        return jnp.sum(buf.preds)

    out["rollout_ms"] = timed(f_roll, (params, pbatch, feats, lat)) * 1e3

    # 6. whole program (bench.py equivalent)
    def f_all(params, batch, key):
        pb = pre_processing(batch, cfg.model, training=True)
        feats = O.encode_episode_features(model, params, pb, training=False, key=None)
        g, gv = O.get_gt_goal(cfg, pb["input/agent_valid"], pb["gt/goal"], pb["gt/dest"])
        lat = model.apply({"params": params}, method="latent", posterior=True, **feats["latent_post"])
        mtf = teacher_forcing_mask(O.tf_cfg_to_sim(cfg.tf_reactive_replay), pb["gt/valid"])
        buf = O.reactive_replay(
            cfg, model, params, pb, feats["input"], lat, g, gv, mtf, key,
            deterministic_latent=True, deterministic_action=True,
        )
        return jnp.sum(buf.preds)

    out["total_ms"] = timed(f_all, (params, batch, key)) * 1e3

    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
