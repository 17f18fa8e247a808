"""Shape-bucketed batches (data/bucketing.py): slicing the fixed map/agent
capacities to the batch's real (bucketed) maximum is exact — padded entries
are masked everywhere downstream, indices point into the kept prefix, and
zero-weight attention contributions are exact in IEEE arithmetic — so the
deterministic eval rollout is bit-identical on the kept slots."""
import numpy as np
import jax
import jax.numpy as jnp

from trafficbots_tpu import orchestration as O
from trafficbots_tpu.data.bucketing import bucket_slice
from trafficbots_tpu.data.preprocessing import pre_processing
from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask

from tiny import tiny_batch, tiny_config


def test_bucket_slice_shapes_and_rounding():
    cfg = tiny_config()
    batch = tiny_batch(cfg, n_scene=2, n_valid_agent=2, n_valid_pl=5,
                       with_agent_no_sim=True)
    out, buckets = bucket_slice(batch, pl_multiple=4, agent_multiple=2)
    assert buckets["n_pl"] == 8  # 5 used -> rounded to 8
    assert out["map/valid"].shape[1] == 8
    assert out["map/pos"].shape[1] == 8
    # agents: 2 valid -> bucket 2
    assert buckets["n_agent"] == 2
    assert out["agent/valid"].shape == (2, cfg.data.n_step, 2)
    assert out["agent/role"].shape[1] == 2
    assert out["history/agent/pos"].shape[2] == 2
    # no_sim group bucketed independently
    assert out["agent_no_sim/valid"].shape[2] == buckets["n_agent_no_sim"]
    # untouched keys keep their shapes; nothing lost
    assert out["tl_lane/idx"].shape == batch["tl_lane/idx"].shape
    assert set(out) == set(batch)
    # all valid content survives
    assert out["map/valid"].sum() == batch["map/valid"].sum()
    assert out["agent/valid"].sum() == batch["agent/valid"].sum()
    # index fields stay in range of the kept prefixes
    assert int(out["agent/dest"].max()) < buckets["n_pl"]
    # capacity already tight -> no-op
    same, b2 = bucket_slice(batch, pl_multiple=1024, agent_multiple=64)
    assert same["map/valid"].shape == batch["map/valid"].shape


def test_bucketed_eval_rollout_equivalent():
    """Pre-processing is bit-identical on the kept slots (pure slicing/
    masking); model outputs agree to fp-tile tolerance — XLA picks different
    matmul tilings for different shapes, so bit-equality across shapes is
    not achievable even for identical math. The rollout comparison runs
    fully teacher-forced (every step restarts from GT) so per-step fp noise
    cannot compound through the closed loop."""
    from dataclasses import replace

    cfg = tiny_config()
    # force every step: spawn + warm start + horizon cover the whole episode
    tf_full = replace(
        cfg.tf_reactive_replay, step_spawn_agent=cfg.time_step_end,
        step_warm_start=10, step_horizon=cfg.time_step_end,
    )
    cfg = replace(cfg, tf_reactive_replay=tf_full)
    batch_np = tiny_batch(cfg, n_scene=2, n_valid_agent=2, n_valid_pl=5)
    sliced_np, buckets = bucket_slice(batch_np, pl_multiple=4, agent_multiple=2)
    assert buckets["n_pl"] < cfg.data.n_pl and buckets["n_agent"] < cfg.data.n_agent

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)

    def eval_rollout(batch):
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
            goal_gt, goal_valid, mask_tf, jax.random.PRNGKey(1),
            deterministic_latent=True, deterministic_action=True,
        )
        return buf.preds, buf.valid

    full_preds, full_valid = jax.jit(eval_rollout)(batch)
    sliced = {k: jnp.asarray(v) for k, v in sliced_np.items()}
    b_preds, b_valid = jax.jit(eval_rollout)(sliced)

    A2 = buckets["n_agent"]
    # validity propagation is discrete: exact
    np.testing.assert_array_equal(np.asarray(full_valid)[:, :A2], np.asarray(b_valid))
    fv = np.asarray(full_valid)[:, :A2][..., None]
    np.testing.assert_allclose(
        np.asarray(full_preds)[:, :A2] * fv, np.asarray(b_preds) * fv,
        rtol=1e-4, atol=1e-4,
    )
    # the dropped agent slots never carried anything valid
    assert not np.asarray(full_valid)[:, A2:].any()


def test_bucketed_pre_processing_bit_identical():
    """The host-side slice + pre-processing views are exactly the full
    batch's values on the kept slots — no fp recomputation is involved."""
    cfg = tiny_config()
    batch_np = tiny_batch(cfg, n_scene=2, n_valid_agent=2, n_valid_pl=5)
    sliced_np, _ = bucket_slice(batch_np, pl_multiple=4, agent_multiple=2)
    pf = pre_processing({k: jnp.asarray(v) for k, v in batch_np.items()}, cfg.model, training=False)
    ps = pre_processing({k: jnp.asarray(v) for k, v in sliced_np.items()}, cfg.model, training=False)
    for k in ps:
        a, b = np.asarray(pf[k]), np.asarray(ps[k])
        sl = tuple(
            slice(0, db) if da != db else slice(None)
            for da, db in zip(a.shape, b.shape)
        )
        np.testing.assert_array_equal(a[sl], b, err_msg=k)
