"""Training actually LEARNS: loss and replay error drop on an overfit batch.

The reference's only training-quality control is empirical convergence of
real runs (SURVEY.md section 4); this is its automated analog — the cheapest
end-to-end guard against sign/masking bugs that weight-transfer parity tests
cannot catch (parity runs the reference's weights, not the reference's
training dynamics). Tiny dims, one synthetic batch, a few dozen Adam steps.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from trafficbots_tpu import orchestration as O
from trafficbots_tpu.data.preprocessing import pre_processing
from trafficbots_tpu.eval import metrics as M
from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask
from trafficbots_tpu.training.train import make_optimizer, make_train_step
from tiny import tiny_batch, tiny_config


def test_loss_and_replay_error_decrease():
    cfg = tiny_config()
    batch_np = tiny_batch(cfg)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)

    tx = make_optimizer(cfg, params, steps_per_epoch=1000)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(cfg, model, tx))

    @jax.jit
    def replay_pos_err(params, batch, key):
        """Deterministic reactive-replay position error on relevant agents."""
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
        gt_valid = jnp.swapaxes(pbatch["gt/valid"][:, cfg.time_step_sim_start:], 1, 2)
        gt_state = jnp.swapaxes(pbatch["gt/state"][:, cfg.time_step_sim_start:], 1, 2)
        sums = M.error_metrics_update(
            buf.valid, buf.preds, gt_valid, gt_state,
            buf.override_masks, pbatch["ref/agent_role"],
        )
        return sums["err_pos_meter"] / jnp.maximum(sums["err_counter"], 1.0)

    key = jax.random.PRNGKey(7)
    err_before = float(replay_pos_err(params, batch, key))

    losses = []
    p, o = params, opt_state
    for i in range(30):
        p, o, m = step(p, o, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))

    # per-module grad-norm breakdown (the reference's track_grad_norm /
    # WatchModel analog): one finite norm per top-level param subtree
    subtree_norms = {k: float(v) for k, v in m.items() if k.startswith("grad_norm/")}
    assert set(subtree_norms) == {f"grad_norm/{k}" for k in p}
    assert all(np.isfinite(v) for v in subtree_norms.values())

    first = float(np.mean(losses[:3]))
    last = float(np.mean(losses[-3:]))
    assert np.isfinite(losses).all(), f"non-finite loss in {losses}"
    # material decrease while overfitting ONE batch — not a lucky wiggle
    assert last < first - 0.1 * abs(first), (
        f"loss did not decrease materially: first3={first:.4f} last3={last:.4f}\n{losses}"
    )

    err_after = float(replay_pos_err(p, batch, key))
    assert np.isfinite(err_before) and np.isfinite(err_after)
    assert err_after < err_before, (
        f"replay err/pos did not improve: before={err_before:.4f} after={err_after:.4f}"
    )
