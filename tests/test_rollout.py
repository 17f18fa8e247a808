"""End-to-end rollout integration tests on a tiny synthetic scene.

Compile-budget note: each distinct traced program (replay forward, training
value_and_grad, joint future pred) is compiled exactly once per module; all
tests share the jitted functions through module-scope fixtures so the suite
stays fast on the CPU test mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbots_tpu import orchestration as O
from trafficbots_tpu.data.preprocessing import pre_processing
from trafficbots_tpu.sim.teacher_forcing import teacher_forcing_mask
from tiny import tiny_batch, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch_np = tiny_batch(cfg)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
    return cfg, model, params, batch


@pytest.fixture(scope="module")
def replay_fn(setup):
    """One jitted reactive-replay program shared by every test below."""
    cfg, model, params, batch = setup

    @jax.jit
    def run(params, batch, key):
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
        return pbatch, buf

    return run


@pytest.fixture(scope="module")
def replay(setup, replay_fn):
    cfg, model, params, batch = setup
    return replay_fn(params, batch, jax.random.PRNGKey(0))


def test_rollout_shapes_and_finite(setup, replay):
    cfg, model, params, batch = setup
    pbatch, buf = replay
    B, A = 2, cfg.data.n_agent
    S = cfg.time_step_end - cfg.time_step_sim_start + 1
    assert buf.valid.shape == (B, A, S)
    assert buf.preds.shape == (B, A, S, 4)
    assert buf.override_masks.shape == (B, A, S)
    assert buf.diffbar_rewards.shape == (B, A, S)
    assert buf.latent_log_probs.shape == (B, A, S)
    assert np.isfinite(np.asarray(buf.preds)).all()
    assert np.isfinite(np.asarray(buf.diffbar_rewards)).all()
    assert buf.step_future_start == cfg.time_step_current + 1 - cfg.time_step_sim_start
    # some agents must be valid at some steps
    assert np.asarray(buf.valid).any()
    assert buf.valid.dtype == np.bool_


def test_rollout_deterministic(setup, replay_fn, replay):
    cfg, model, params, batch = setup
    _, buf1 = replay
    _, buf2 = replay_fn(params, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(buf1.preds), np.asarray(buf2.preds))


def test_reactive_replay_overrides_match_gt(setup, replay):
    """With reactive-replay TF config (spawn<=90), every GT-valid rising edge
    and warm-start step must be overridden."""
    cfg, model, params, batch = setup
    pbatch, buf = replay
    gt_valid = np.asarray(pbatch["gt/valid"])  # [B, T, A]
    om = np.asarray(buf.override_masks)  # [B, A, S], steps 1..end
    # warm start steps 1..10 forced wherever GT valid
    for s in range(1, cfg.time_step_current + 1):
        np.testing.assert_array_equal(om[:, :, s - 1], gt_valid[:, s])


def test_training_value_and_grad(setup):
    """One compile covers: training loss finiteness, metric accumulation, and
    gradient flow through the 90-step BPTT scan."""
    cfg, model, params, batch = setup

    @jax.jit
    def loss_fn(params, batch, key):
        loss, metrics = O.training_step(cfg, model, params, batch, key)
        return loss, metrics

    (loss, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    assert "diffbar_reward_sum" in metrics and "vae_kl_sum" in metrics
    assert float(metrics["diffbar_reward_count"]) > 0
    leaves = jax.tree.leaves(g)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(total) and total > 0


def test_remat_policy_grad_equivalence(setup):
    """remat_policy only changes WHAT the backward rematerializes, never the
    math: gradients under "save_attn" must equal the default "none" policy."""
    import dataclasses

    cfg, model, params, batch = setup

    def grads_for(c):
        def loss_fn(p):
            loss, _ = O.training_step(c, model, p, batch, jax.random.PRNGKey(3))
            return loss

        return jax.jit(jax.grad(loss_fn))(params)

    g_none = grads_for(cfg)
    for policy in ("save_attn", "save_core"):
        g_pol = grads_for(dataclasses.replace(cfg, remat_policy=policy))
        # tolerance: the policies compile different backward programs, so fp32
        # fusion/summation order differs (measured max |delta| ~2e-7); anything
        # beyond that is a real math divergence
        for a, b in zip(jax.tree.leaves(g_none), jax.tree.leaves(g_pol)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-6,
                err_msg=policy,
            )


def test_joint_future_pred(setup):
    cfg, model, params, batch = setup

    @jax.jit
    def run(params, batch, key):
        pbatch = pre_processing(batch, cfg.model, training=True)
        feats = O.encode_episode_features(model, params, pbatch, training=False, key=None)
        goal_gt, goal_valid = O.get_gt_goal(
            cfg, pbatch["input/agent_valid"], pbatch["gt/goal"], pbatch["gt/dest"]
        )
        goal_pred = model.apply(
            {"params": params}, method="pred_goal",
            agent_type=pbatch["ref/agent_type"], map_type=pbatch["ref/map_type"],
            agent_state=pbatch["ref/agent_state"], **feats["input"],
        )
        latent_prior = model.apply(
            {"params": params}, method="latent", posterior=False, **feats["latent_prior"]
        )
        return O.joint_future_pred(
            cfg, model, params, pbatch, feats["input"], latent_prior,
            goal_pred, goal_valid, key,
        )

    buf, goal_sample, goal_logp = run(params, batch, jax.random.PRNGKey(2))
    B, A, K = 2, cfg.data.n_agent, cfg.n_joint_future
    S = cfg.time_step_end - cfg.time_step_sim_start + 1
    assert buf.valid.shape == (B, A, K, S)
    assert buf.preds.shape == (B, A, K, S, 4)
    assert goal_sample.shape == (B, A, K)
    assert goal_logp.shape == (B, A, K)
    assert np.isfinite(np.asarray(buf.preds)).all()


def test_gt_sdc_what_if_rollout(setup):
    """gt_sdc (what-if prediction): with tf cfg gt_sdc=True the SDC (agent 0)
    is forced to its GT trajectory at every step while others roll out
    closed-loop. Ref teacher_forcing.py:69-72 + configs/resume recipe."""
    import dataclasses

    cfg, model, params, batch = setup
    tf = dataclasses.replace(cfg.tf_joint_future_pred, gt_sdc=True)

    @jax.jit
    def run(params, batch, key):
        pbatch = pre_processing(batch, cfg.model, training=True)
        feats = O.encode_episode_features(model, params, pbatch, training=False, key=None)
        goal_gt, goal_valid = O.get_gt_goal(
            cfg, pbatch["input/agent_valid"], pbatch["gt/goal"], pbatch["gt/dest"]
        )
        latent_post = model.apply(
            {"params": params}, method="latent", posterior=True, **feats["latent_post"]
        )
        mask_tf = teacher_forcing_mask(O.tf_cfg_to_sim(tf), pbatch["gt/valid"])
        buf = O.reactive_replay(
            cfg, model, params, pbatch, feats["input"], latent_post,
            goal_gt, goal_valid, mask_tf, key,
            deterministic_latent=True, deterministic_action=True,
        )
        return pbatch, buf

    pbatch, buf = run(params, batch, jax.random.PRNGKey(0))
    gt_valid = np.asarray(pbatch["gt/valid"])  # [B, T, A]
    gt_state = np.asarray(pbatch["gt/state"])  # [B, T, A, 4]
    preds = np.asarray(buf.preds)  # [B, A, S, 4] (PRE-override, ref semantics)
    om = np.asarray(buf.override_masks)
    S = preds.shape[2]
    # the SDC is overridden at every GT-valid step
    for s in range(1, S + 1):
        np.testing.assert_array_equal(om[:, 0, s - 1], gt_valid[:, s, 0])
    # beyond warm start, non-SDC agents are NOT all forced
    assert not om[:, 1:, cfg.time_step_current + 5 :].all()
    # the buffered pred is pre-override, but each step integrates FROM the
    # overridden (GT) state, so the SDC's prediction stays within one
    # integration step of GT at every late step (one dt of max accel/speed)
    late = slice(cfg.time_step_current + 2, S)  # buffer idx s-1 <-> abs step s
    sdc_err = np.linalg.norm(
        preds[:, 0, late, :2] - gt_state[:, cfg.time_step_current + 3 :, 0, :2], axis=-1
    )
    valid_late = gt_valid[:, cfg.time_step_current + 3 :, 0]
    assert (sdc_err[valid_late] < 3.0).all(), sdc_err[valid_late].max()
