"""Golden tests for teacher-forcing masks (teacher_forcing.py:32-74 reference)."""
import numpy as np
import jax
import jax.numpy as jnp

from trafficbots_tpu.sim import teacher_forcing as TF


def _numpy_reference(valid, step_spawn, step_warm, step_horizon=0, gt_sdc=False):
    """Independent numpy implementation of the mask rules."""
    n, T, a = valid.shape
    mask = np.zeros_like(valid)
    mask[:, 0] |= valid[:, 0]
    if step_spawn > 0:
        rising = (~valid[:, :-1]) & valid[:, 1:]
        rising[:, step_spawn:] = False
        mask[:, 1:] |= rising
    if step_warm >= 0:
        mask[:, : step_warm + 1] |= valid[:, : step_warm + 1]
    if step_horizon > 0:
        mask[:, :step_horizon] |= valid[:, :step_horizon]
    if gt_sdc:
        mask[:, :, 0] |= valid[:, :, 0]
    return mask


def _random_valid(seed=0, n=2, T=91, a=8):
    rng = np.random.RandomState(seed)
    valid = np.zeros((n, T, a), dtype=bool)
    for i in range(n):
        for j in range(a):
            start = rng.randint(0, 60)
            end = rng.randint(start + 1, T + 1)
            valid[i, start:end, j] = True
    return valid


def test_training_config_matches_numpy():
    valid = _random_valid(0)
    out = np.asarray(TF.teacher_forcing_mask(TF.TF_TRAINING, jnp.asarray(valid)))
    exp = _numpy_reference(valid, step_spawn=10, step_warm=10)
    np.testing.assert_array_equal(out, exp)


def test_reactive_replay_config():
    valid = _random_valid(1)
    out = np.asarray(TF.teacher_forcing_mask(TF.TF_REACTIVE_REPLAY, jnp.asarray(valid)))
    exp = _numpy_reference(valid, step_spawn=90, step_warm=10)
    np.testing.assert_array_equal(out, exp)


def test_bc_horizon():
    cfg = TF.TeacherForcingConfig(step_spawn_agent=10, step_warm_start=10, step_horizon=91)
    valid = _random_valid(2)
    out = np.asarray(TF.teacher_forcing_mask(cfg, jnp.asarray(valid)))
    # full horizon: every valid step forced
    np.testing.assert_array_equal(out, valid)


def test_gt_sdc():
    valid = _random_valid(3)
    valid[:, :, 0] = True
    out = np.asarray(
        TF.teacher_forcing_mask(TF.TF_JOINT_FUTURE_PRED, jnp.asarray(valid), gt_sdc=True)
    )
    exp = _numpy_reference(valid, step_spawn=10, step_warm=10, gt_sdc=True)
    np.testing.assert_array_equal(out, exp)


def test_prob_forcing_agent():
    cfg = TF.TeacherForcingConfig(prob_forcing_agent=1.0)
    valid = _random_valid(4)
    out = np.asarray(
        TF.teacher_forcing_mask(cfg, jnp.asarray(valid), key=jax.random.PRNGKey(0))
    )
    # prob=1: every valid step is forced
    np.testing.assert_array_equal(out, valid)
