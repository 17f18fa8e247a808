"""Train-step decomposition on the real chip (D2H-synced A/Bs).

Not part of the framework — a scratch profiling harness for PERF.md work.
The round-2 train step was 1472 ms @ batch 32 vs ~85 ms for the eval
forward; this measures where the gap lives before pulling levers:

  base         : full train step, default config
  fwd          : training-mode loss forward only (no grad)
  no_remat     : full step without per-step rollout remat
  no_dropout   : full step with every dropout_p = 0 (fused attention and
                 shared map encoding become eligible under training)
  bf16         : full step with precision=bf16 (encoder compute dtype)
  no_do_bf16   : both of the above

Env: BENCH_N_SCENE (default 32), N_ITER (default 4), VARIANTS (comma list to
run a subset, e.g. VARIANTS=base,save_attn), FILL ('n_pl,n_agent' valid
counts, e.g. FILL=768,40 for the WOMD-like fill — round-4 honesty rule:
train numbers are quoted at this fill, not the sparse synthetic default).
The TRAIN kernels' dead-row/block skips are import-time (TB_PAD_SKIP=0
disables all of them) — A/B those across separate processes.
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import json
import os
import time

import numpy as np


def no_dropout(cfg):
    from dataclasses import replace

    m = cfg.model
    m = replace(
        m,
        tf_cfg=replace(m.tf_cfg, dropout_p=0.0),
        input_pe_encoder=replace(m.input_pe_encoder, mlp_dropout_p=0.0),
        map_encoder=replace(m.map_encoder, mlp_dropout_p=0.0),
        agent_temporal=replace(m.agent_temporal, dropout=0.0),
        add_latent=replace(m.add_latent, dropout_p=0.0),
        add_goal=replace(m.add_goal, dropout_p=0.0),
    )
    return replace(cfg, model=m)


def main():
    import jax
    import jax.numpy as jnp

    from trafficbots_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("tpu")

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.training.train import make_optimizer, make_train_step

    n_scene = int(os.environ.get("BENCH_N_SCENE", "32"))
    n_iter = int(os.environ.get("N_ITER", "4"))
    base_cfg = ExperimentConfig()
    fill_kw = {}
    if os.environ.get("FILL"):
        n_pl, n_ag = (int(x) for x in os.environ["FILL"].split(","))
        fill_kw = {"n_valid_pl": n_pl, "n_valid_agent": n_ag}
    batch_np = synthetic_episode_batch(base_cfg.data, n_scene=n_scene, seed=0, **fill_kw)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(base_cfg, jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    def time_step(cfg, label, forward_only=False):
        try:
            tx = make_optimizer(cfg, params)
            if forward_only:
                def fn(p, b, k):
                    loss, _ = O.training_step(cfg, model, p, b, k, current_epoch=0)
                    return loss

                jf = jax.jit(fn)
                float(jf(params, batch, key))
                ts = []
                for i in range(n_iter):
                    t0 = time.perf_counter()
                    float(jf(params, batch, jax.random.fold_in(key, i)))
                    ts.append(time.perf_counter() - t0)
            else:
                opt_state = tx.init(params)
                step = jax.jit(make_train_step(cfg, model, tx))
                p2, o2, m = step(params, opt_state, batch, key)
                float(m["loss"])
                ts = []
                for i in range(n_iter):
                    t0 = time.perf_counter()
                    p2, o2, m = step(p2, o2, batch, jax.random.fold_in(key, i))
                    float(m["loss"])
                    ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[len(ts) // 2] * 1e3
            print(f"{label}: {dt:.1f} ms", flush=True)
            return round(dt, 1)
        except Exception as e:  # keep the sweep alive across variant failures
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    nd = no_dropout(base_cfg)
    variants = {
        "base": lambda: time_step(base_cfg, "base"),
        "fwd": lambda: time_step(base_cfg, "fwd", forward_only=True),
        "no_remat": lambda: time_step(
            dataclasses.replace(base_cfg, remat_rollout_step=False), "no_remat"
        ),
        "save_attn": lambda: time_step(
            dataclasses.replace(base_cfg, remat_policy="save_attn"), "save_attn"
        ),
        "save_core": lambda: time_step(
            dataclasses.replace(base_cfg, remat_policy="save_core"), "save_core"
        ),
        "remat_none_policy": lambda: time_step(
            dataclasses.replace(base_cfg, remat_policy="none"), "remat_none_policy"
        ),
        "no_node_skip": lambda: time_step(
            dataclasses.replace(
                base_cfg,
                model=dataclasses.replace(
                    base_cfg.model,
                    map_encoder=dataclasses.replace(
                        base_cfg.model.map_encoder, fused_skip_invalid_blocks=False
                    ),
                ),
            ),
            "no_node_skip",
        ),
        "no_dropout": lambda: time_step(nd, "no_dropout"),
        "no_dropout_fwd": lambda: time_step(nd, "no_dropout_fwd", forward_only=True),
        "bf16": lambda: time_step(dataclasses.replace(base_cfg, precision="bf16"), "bf16"),
        "no_do_bf16": lambda: time_step(dataclasses.replace(nd, precision="bf16"), "no_do_bf16"),
    }
    sel = os.environ.get("VARIANTS")
    names = [n.strip() for n in sel.split(",")] if sel else list(variants)
    out = {"n_scene": n_scene, "fill": os.environ.get("FILL", "sparse_default"),
           "pad_skip": os.environ.get("TB_PAD_SKIP", "1")}
    for name in names:
        out[name] = variants[name]()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
