"""Validation-loop tests: val-mode pre-processing semantics + end-to-end Validator.

The reference switches pre-processing to the separately packed history/* keys
during validation (/root/reference/src/data_modules/scene_centric.py:93
`prefix = "" if self.training else "history/"`) while gt/* stays on the full
agent/* keys. These tests pin that behavior and drive the whole Validator
(device step -> metric sums -> WOMD packing -> epoch_end) on synthetic data.
"""
import jax
import numpy as np
import jax.numpy as jnp

from tiny import tiny_config, tiny_batch
from trafficbots_tpu import orchestration as O
from trafficbots_tpu.data.preprocessing import pre_processing
from trafficbots_tpu.evaluation_loop import Validator, validation_device_step


def _val_batch_with_divergent_history(cfg, n_scene=2, seed=0):
    """A val-contract batch where history/agent/valid differs from agent/valid[:11]."""
    batch = tiny_batch(cfg, n_scene=n_scene, seed=seed)
    H = cfg.data.n_step_history
    # packed history view: agent 0 has a gap the full-GT view does not have,
    # and one agent visible in GT is entirely absent from history
    batch["history/agent/valid"] = batch["history/agent/valid"].copy()
    batch["history/agent/valid"][:, H // 2, 0] = False
    batch["history/agent/valid"][:, :, 1] = False
    # history kinematics also diverge (history-local interpolation in packing)
    batch["history/agent/spd"] = batch["history/agent/spd"] + 0.25
    return batch


def test_val_preprocessing_uses_history_view():
    """training=False: input/prior views follow history/*, gt/* follows agent/*."""
    cfg = tiny_config()
    batch = _val_batch_with_divergent_history(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    out = pre_processing(jbatch, cfg.model, n_step_hist=11, training=False)

    H = 11
    # input view = history view, which differs from agent/valid[:11]
    np.testing.assert_array_equal(
        np.asarray(out["input/agent_valid"]), batch["history/agent/valid"][:, :H]
    )
    assert (batch["history/agent/valid"][:, :H] != batch["agent/valid"][:, :H]).any()
    # featurized attr follows the (shifted) history spd, not the GT spd
    spd_attr = np.asarray(out["input/agent_attr"][..., 2:3])
    np.testing.assert_allclose(spd_attr, batch["history/agent/spd"][:, :H], atol=1e-6)
    # latent prior view shares the history-based input view
    np.testing.assert_array_equal(
        np.asarray(out["latent_prior/agent_valid"]), batch["history/agent/valid"][:, :H]
    )
    # gt/* stays on the full-GT agent keys
    np.testing.assert_array_equal(np.asarray(out["gt/valid"]), batch["agent/valid"])
    np.testing.assert_allclose(
        np.asarray(out["gt/state"][..., 3:4]), batch["agent/spd"], atol=1e-6
    )
    # latent posterior view sees the full 91-step GT
    np.testing.assert_array_equal(
        np.asarray(out["latent_post/agent_valid"]), batch["agent/valid"]
    )
    # ref/ keys come from the history prefix in val mode (scene_centric.py:128-129)
    np.testing.assert_array_equal(
        np.asarray(out["ref/agent_type"]), batch["history/agent/type"]
    )


def test_val_preprocessing_builds_no_sim_context():
    """agent_no_sim/* context keys are built in val mode (scene_centric.py:120-125)."""
    cfg = tiny_config()
    batch = tiny_batch(cfg, with_agent_no_sim=True)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    out = pre_processing(jbatch, cfg.model, n_step_hist=11, training=False)
    assert out["sc/agent_no_sim_valid"].shape == (2, 11, cfg.data.n_agent_no_sim)
    assert out["sc/agent_no_sim_type"].shape == (2, cfg.data.n_agent_no_sim, 3)


def test_validator_end_to_end():
    """Full Validator: device step, metric accumulation, WOMD compute, val/loss."""
    # WOMD metrics need the challenge's 80-step future horizon
    cfg = tiny_config(n_step=91, time_step_end=90)
    batch = _val_batch_with_divergent_history(cfg)
    key = jax.random.PRNGKey(0)
    model, params = O.init_params(cfg, key, {k: jnp.asarray(v) for k, v in batch.items()})

    v = Validator(cfg, model, use_native_metrics=False)
    v.step(params, batch, jax.random.PRNGKey(1))
    out = v.epoch_end()

    assert "val/loss" in out and np.isfinite(out["val/loss"])
    for k in (
        "reactive_replay/err/pos_meter",
        "joint_future_pred/err/pos_meter",
        "reactive_replay/min_ade",
        "joint_future_pred/mean_average_precision",
        "reactive_replay/vae_kl",
    ):
        assert k in out, f"missing metric {k}"
        assert np.isfinite(out[k]), f"non-finite metric {k}"


def test_validation_device_step_jits_under_val_semantics():
    """The jitted device step compiles and returns finite rollout summaries."""
    cfg = tiny_config()
    batch = tiny_batch(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    key = jax.random.PRNGKey(0)
    model, params = O.init_params(cfg, key, jbatch)
    out = jax.jit(
        lambda p, b, k: validation_device_step(cfg, model, p, b, k)
    )(params, jbatch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out["pred_jf"]["waymo_trajs"])).all()
    assert out["buf_rr_preds"].shape[0] == 2
