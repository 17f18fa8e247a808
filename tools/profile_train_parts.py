"""Backward-cost decomposition of the train step (scratch harness, PERF.md).

The round-3 train step is 887 ms @ batch 32 with a 257 ms forward — this
locates the ~630 ms of backward+opt by timing value_and_grad of sub-losses
and of the full loss with selected inputs stop_gradient'ed:

  enc_grad       : grad of (episode encoders only)       -> encoder fwd+bwd
  enc_gl_grad    : + goal predictor + both latents       -> adds their bwd
  full           : the real training step (reference)
  sg_enc         : full loss, but stop_gradient on feats/latent/goal before
                   the rollout -> excludes encoder/latent/goal BACKWARD
                   while still paying their forward
  full - sg_enc  ~= encoder-side backward;  sg_enc - fwd ~= scan backward

Env: BENCH_N_SCENE (default 32), N_ITER (default 3).
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
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.training.loss import training_loss
    from trafficbots_tpu.orchestration import (
        encode_episode_features, extract, get_gt_goal, pre_processing,
        reactive_replay, teacher_forcing_mask, tf_cfg_to_sim,
    )

    n_scene = int(os.environ.get("BENCH_N_SCENE", "32"))
    n_iter = int(os.environ.get("N_ITER", "3"))
    cfg = ExperimentConfig()
    fill_kw = {}
    if os.environ.get("FILL"):
        n_pl, n_ag = (int(x) for x in os.environ["FILL"].split(","))
        fill_kw = {"n_valid_pl": n_pl, "n_valid_agent": n_ag}
    batch_np = synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=0, **fill_kw)
    batch0 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch0)
    key = jax.random.PRNGKey(1)

    def tree_sum(t):
        leaves = [jnp.sum(x) for x in jax.tree.leaves(t) if x is not None]
        return sum(leaves) if leaves else jnp.zeros(())

    def build_parts(p, batch, k, sg_enc=False, upto="full"):
        k_pre, k_enc, k_goal, k_lat, k_coin, k_tf, k_roll, k_irr = jax.random.split(k, 8)
        batch = pre_processing(batch, cfg.model, n_step_hist=cfg.time_step_current + 1,
                               training=True, key=k_pre)
        feats = encode_episode_features(model, p, batch, training=True, key=k_enc)
        if upto == "enc":
            return tree_sum(feats)
        input_dict = extract(batch, "input")
        if upto == "goal":
            goal_pred = model.apply(
                {"params": p}, method="pred_goal", rngs={"dropout": k_goal},
                deterministic=False, agent_type=batch["ref/agent_type"],
                map_type=batch["ref/map_type"], agent_state=batch["ref/agent_state"],
                **{k_: jax.lax.stop_gradient(v) if hasattr(v, "dtype") else v
                   for k_, v in feats["input"].items()},
            )
            return tree_sum(goal_pred)
        goal_gt, goal_valid = get_gt_goal(cfg, input_dict["agent_valid"],
                                          batch["gt/goal"], batch["gt/dest"])
        goal_pred = model.apply(
            {"params": p}, method="pred_goal", rngs={"dropout": k_goal},
            deterministic=False, agent_type=batch["ref/agent_type"],
            map_type=batch["ref/map_type"], agent_state=batch["ref/agent_state"],
            **feats["input"],
        )
        latent_post = model.apply({"params": p}, method="latent", posterior=True,
                                  deterministic=False, rngs={"dropout": k_lat},
                                  **feats["latent_post"])
        latent_prior = model.apply({"params": p}, method="latent", posterior=False,
                                   deterministic=False, rngs={"dropout": k_lat},
                                   **feats["latent_prior"])
        if upto == "enc_gl":
            return tree_sum(feats) + tree_sum(goal_pred) + tree_sum(latent_post) + tree_sum(latent_prior)
        if sg_enc:
            # exclude ALL encoder-side backward: the loss terms (KL, goal
            # NLL) feed latent/goal too, so they must be cut here as well —
            # the first sg_enc variant only cut the rollout inputs and
            # measured ~nothing (the KL still backprop'd the map encoder)
            goal_pred = jax.lax.stop_gradient(goal_pred)
            latent_post = jax.lax.stop_gradient(latent_post)
            latent_prior = jax.lax.stop_gradient(latent_prior)
        use_prior = jax.random.uniform(k_coin, ()) < cfg.p_training_rollout_prior
        latent = jax.tree.map(
            lambda a, b: jnp.where(use_prior, a, b) if a is not None else None,
            latent_prior, latent_post)
        mask_tf = teacher_forcing_mask(tf_cfg_to_sim(cfg.tf_training),
                                       batch["gt/valid"], 0, key=k_tf)
        if sg_enc:
            feats_in = jax.lax.stop_gradient(feats["input"])
            latent = jax.lax.stop_gradient(latent)
            goal_gt_r = jax.lax.stop_gradient(goal_gt)
        else:
            feats_in, goal_gt_r = feats["input"], goal_gt
        buf = reactive_replay(cfg, model, p, batch, feats_in, latent,
                              goal_gt_r, goal_valid, mask_tf, k_roll,
                              deterministic_latent=False,
                              deterministic_action=cfg.training_deterministic_action,
                              training=True)
        loss, _ = training_loss(
            cfg.training_metrics, pred_valid=buf.valid,
            diffbar_rewards_valid=buf.diffbar_rewards_valid,
            diffbar_rewards=buf.diffbar_rewards,
            override_masks=buf.override_masks, agent_role=batch["ref/agent_role"],
            goal_valid=goal_valid, goal_pred=goal_pred, goal_gt=goal_gt,
            latent_post=latent_post, latent_prior=latent_prior,
            step_start=cfg.time_step_sim_start, irrelevant_key=k_irr)
        return loss

    def timeit(label, fn):
        try:
            jf = jax.jit(fn)
            out = jf(params, batch0, key)
            jax.tree.map(lambda x: float(jnp.sum(x)) if x is not None else 0.0,
                         out[0] if isinstance(out, tuple) else out)
            ts = []
            for i in range(n_iter):
                t0 = time.perf_counter()
                out = jf(params, batch0, jax.random.fold_in(key, i))
                leaf = jax.tree.leaves(out)[0]
                float(jnp.sum(leaf))
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[len(ts) // 2] * 1e3
            print(f"{label}: {dt:.1f} ms", flush=True)
            return round(dt, 1)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    out = {"n_scene": n_scene}
    out["enc_grad"] = timeit(
        "enc_grad", lambda p, b, k: jax.grad(lambda pp: build_parts(pp, b, k, upto="enc"))(p))
    out["goal_grad"] = timeit(
        "goal_grad", lambda p, b, k: jax.grad(lambda pp: build_parts(pp, b, k, upto="goal"))(p))
    out["enc_gl_grad"] = timeit(
        "enc_gl_grad", lambda p, b, k: jax.grad(lambda pp: build_parts(pp, b, k, upto="enc_gl"))(p))
    out["sg_enc"] = timeit(
        "sg_enc", lambda p, b, k: jax.grad(lambda pp: build_parts(pp, b, k, sg_enc=True))(p))
    out["full"] = timeit(
        "full", lambda p, b, k: jax.grad(lambda pp: build_parts(pp, b, k))(p))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
