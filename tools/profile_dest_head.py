"""Micro-profile of the dest-predictor head (scratch harness, PERF.md).

The round-4 train decomposition at WOMD-like fill put pred_goal at ~97 ms
fwd+bwd @ batch 32 — disproportionate for a 3-layer MLP head. Hypothesis:
the head is HBM-bound, not FLOP-bound: the factored pair-MLP still
materializes [S, A, P, 128] fp32 intermediates (~1.1 GB each at batch 32)
for the broadcast-add, the two layernorms and the middle matmul, and the
backward re-reads them. This times fwd vs fwd+bwd and a bf16 variant to
separate FLOP from traffic.

Env: BENCH_N_SCENE (default 32), N_ITER (default 6), FILL (n_pl,n_agent).
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from trafficbots_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("tpu")

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.data.preprocessing import pre_processing
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.orchestration import encode_episode_features, extract

    n_scene = int(os.environ.get("BENCH_N_SCENE", "32"))
    n_iter = int(os.environ.get("N_ITER", "6"))
    cfg = ExperimentConfig()
    fill_kw = {"n_valid_pl": 768, "n_valid_agent": 40}
    if os.environ.get("FILL"):
        n_pl, n_ag = (int(x) for x in os.environ["FILL"].split(","))
        fill_kw = {"n_valid_pl": n_pl, "n_valid_agent": n_ag}
    batch_np = synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=0, **fill_kw)
    batch0 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch0)
    key = jax.random.PRNGKey(1)

    # precompute the head inputs OUTSIDE the timed region
    k_pre, k_enc, k_goal = jax.random.split(key, 3)
    batch = pre_processing(batch0, cfg.model, n_step_hist=cfg.time_step_current + 1,
                           training=True, key=k_pre)
    feats_fn = jax.jit(lambda p, b, k: encode_episode_features(model, p, b, training=True, key=k))
    feats = jax.block_until_ready(feats_fn(params, batch, k_enc))
    inp = feats["input"]

    def head_loss(p, k):
        dist = model.apply(
            {"params": p}, method="pred_goal", rngs={"dropout": k},
            deterministic=False, agent_type=batch["ref/agent_type"],
            map_type=batch["ref/map_type"], agent_state=batch["ref/agent_state"],
            **inp,
        )
        leaves = [jnp.sum(x) for x in jax.tree.leaves(dist) if x is not None]
        return sum(leaves)

    def timed(fn, label, out):
        f = jax.jit(fn)
        r = f(params, k_goal)
        float(r[0] if isinstance(r, tuple) else r)  # compile + D2H
        ts = []
        for i in range(n_iter):
            kk = jax.random.fold_in(k_goal, i)
            t0 = time.perf_counter()
            r = f(params, kk)
            float(jax.tree.leaves(r)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        out[label] = round(sorted(ts)[len(ts) // 2] * 1e3, 2)
        print(f"{label}: {out[label]} ms", flush=True)

    out = {"n_scene": n_scene, "fill": str(fill_kw)}
    timed(head_loss, "fwd", out)
    timed(lambda p, k: jax.value_and_grad(head_loss)(p, k), "fwd_bwd", out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
