"""Interactive step-at-a-time simulation (sim/interactive.py).

The scan rollout and the jitted per-step body share every line of
simulation code (rollout.build_sim), so N interactive steps must match the
scan's first N steps: every boolean column exactly, floats to fusion-level
tolerance (the standalone-jitted body and the scan body are separate XLA
compilations, whose op fusion may differ in the last ulp — measured max
rel diff 5e-6 over the 15-step closed loop). Per-step intervention must
apply the exact teacher-forcing override semantics.
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
    args = (cfg, model, params, pbatch, feats["input"], latent_post,
            goal_gt, goal_valid, mask_tf, jax.random.PRNGKey(7))
    return args


@pytest.fixture(scope="module")
def scan_buf(setup):
    (cfg, model, params, pbatch, inp, latent, goal_gt, goal_valid,
     mask_tf, key) = setup
    return O.reactive_replay(
        cfg, model, params, pbatch, inp, latent, goal_gt, goal_valid,
        mask_tf, key, deterministic_latent=True, deterministic_action=True,
    )


def _make_sim(setup):
    (cfg, model, params, pbatch, inp, latent, goal_gt, goal_valid,
     mask_tf, key) = setup
    return O.interactive_replay(
        cfg, model, params, pbatch, inp, latent, goal_gt, goal_valid,
        mask_tf, key, deterministic_latent=True, deterministic_action=True,
    )


def test_interactive_matches_scan(setup, scan_buf):
    sim = _make_sim(setup)
    buf = sim.run_to_end().finish()
    for name in ("valid", "override_masks"):
        np.testing.assert_array_equal(
            np.asarray(getattr(buf, name)), np.asarray(getattr(scan_buf, name)),
            err_msg=name,
        )
    for name in ("preds", "diffbar_rewards", "latent_log_probs",
                 "action_log_probs"):
        np.testing.assert_allclose(
            np.asarray(getattr(buf, name)), np.asarray(getattr(scan_buf, name)),
            rtol=2e-5, atol=2e-5, err_msg=name,
        )
    for k, v in buf.violations.items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(scan_buf.violations[k]), err_msg=k
        )
    assert buf.step_future_start == scan_buf.step_future_start


def test_interactive_prefix_matches_scan(setup, scan_buf):
    """Stopping early gives exactly the scan's first N step columns."""
    sim = _make_sim(setup)
    n = 3
    for _ in range(n):
        sim.step()
    assert not sim.done
    buf = sim.finish()
    np.testing.assert_allclose(
        np.asarray(buf.preds), np.asarray(scan_buf.preds[:, :, :n]),
        rtol=2e-5, atol=2e-5,
    )


def test_interactive_intervention_forces_state(setup):
    """Overriding one agent's state mid-rollout lands exactly (the masked
    post-integration override of ref waymo_motion.py:271-284), and only on
    the targeted agent/step."""
    (cfg, *_rest) = setup
    sim = _make_sim(setup)
    ref = _make_sim(setup)

    n_before = 4
    for _ in range(n_before):
        sim.step()
        ref.step()

    B, A = sim.carry.agent.valid.shape
    mask = jnp.zeros((B, A), bool).at[:, 1].set(True)
    forced_state = jnp.tile(
        jnp.asarray([1.5, -2.0, 0.25, 3.0]), (B, A, 1)
    )
    out = sim.step(
        mask_override=mask,
        state_override={
            "state": forced_state,
            "vel": jnp.zeros((B, A, 2)),
            "acc": jnp.zeros((B, A, 1)),
            "yaw_rate": jnp.zeros((B, A, 1)),
        },
    )
    ref_out = ref.step()

    # the forced agent's carried state is exactly the injected one ...
    np.testing.assert_array_equal(
        np.asarray(sim.carry.agent.state[:, 1]), np.asarray(forced_state[:, 1])
    )
    assert np.asarray(sim.carry.agent.valid[:, 1]).all()
    # ... the RECORDED prediction is pre-override (ref waymo_motion.py:186)
    np.testing.assert_array_equal(np.asarray(out.pred), np.asarray(ref_out.pred))
    # and non-forced agents' carried states are untouched
    np.testing.assert_array_equal(
        np.asarray(sim.carry.agent.state[:, 2:]),
        np.asarray(ref.carry.agent.state[:, 2:]),
    )
    # non-forced agents' diffbar reward is still computed against the true
    # GT: the injected filler (zeros) must reach ONLY the masked agent
    others = [0] + list(range(2, A))
    np.testing.assert_allclose(
        np.asarray(out.diffbar_reward[:, others]),
        np.asarray(ref_out.diffbar_reward[:, others]),
        rtol=2e-5, atol=2e-5,
    )
    # an injected state without a mask is a caller error, not a silent
    # whole-batch GT replacement
    with pytest.raises(ValueError):
        sim.step(state_override={"state": forced_state})

    # the trajectories may diverge from here on; both must stay finite
    buf = sim.run_to_end().finish()
    assert np.isfinite(np.asarray(buf.preds)).all()
