"""Golden tests for the differentiable reward (rewards.py:33-131 in reference)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from trafficbots_tpu.sim import rewards as R


def test_smooth_l1_matches_torch():
    rng = np.random.RandomState(0)
    a = rng.uniform(-3, 3, size=(100,)).astype(np.float32)
    b = rng.uniform(-3, 3, size=(100,)).astype(np.float32)
    ours = np.asarray(R.smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    ref = torch.nn.SmoothL1Loss(reduction="none")(torch.tensor(a), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_angular_error_cosine():
    a = jnp.asarray(np.array([0.0, np.pi / 2], dtype=np.float32))
    b = jnp.asarray(np.array([0.0, 0.0], dtype=np.float32))
    out = np.asarray(R.angular_error(a, b, "cosine"))
    np.testing.assert_allclose(out, [0.0, 0.5], atol=1e-6)


def test_il_reward_zero_when_matching_gt():
    cfg = R.RewardConfig()
    n, a = 2, 3
    rng = np.random.RandomState(1)
    state = jnp.asarray(rng.uniform(-5, 5, size=(n, a, 4)).astype(np.float32))
    valid = jnp.ones((n, a), dtype=bool)
    size = jnp.ones((n, a, 3)) * 4.0
    reward, rvalid = R.differentiable_reward(cfg, valid, state, valid, state, size)
    np.testing.assert_allclose(np.asarray(reward), 0.0, atol=1e-6)
    assert np.asarray(rvalid).all()


def test_il_reward_golden():
    cfg = R.RewardConfig()
    pred = jnp.asarray(np.array([[[0.0, 0.0, 0.0, 1.0]]], dtype=np.float32))
    gt = jnp.asarray(np.array([[[0.5, 0.0, np.pi / 2, 3.0]]], dtype=np.float32))
    valid = jnp.ones((1, 1), dtype=bool)
    size = jnp.ones((1, 1, 3)) * 4.0
    reward, _ = R.differentiable_reward(cfg, valid, pred, valid, gt, size)
    # pos smoothl1(0.5,0)=0.125 (sum over xy), rot cosine 0.5*(1-cos(pi/2))=0.5,
    # spd smoothl1(3,1)=1.5; weights 0.1, 10, 0.1
    expected = -(0.1 * 0.125 + 10 * 0.5 + 0.1 * 1.5)
    np.testing.assert_allclose(np.asarray(reward)[0, 0], expected, rtol=1e-5)


def test_reward_invalid_gt_masks():
    cfg = R.RewardConfig()
    pred = jnp.zeros((1, 2, 4))
    gt = jnp.ones((1, 2, 4)) * 100
    valid = jnp.ones((1, 2), dtype=bool)
    gt_valid = jnp.asarray(np.array([[True, False]]))
    size = jnp.ones((1, 2, 3))
    reward, rvalid = R.differentiable_reward(cfg, valid, pred, gt_valid, gt, size)
    assert np.asarray(reward)[0, 1] == 0.0
    assert np.asarray(rvalid).tolist() == [[True, False]]
    assert np.asarray(reward)[0, 0] < 0


def test_collision_penalty():
    cfg = R.RewardConfig(w_collision=1.0, use_il_loss=False)
    # two identical vehicles on top of each other -> strong penalty
    state = jnp.asarray(
        np.array([[[0.0, 0.0, 0.0, 0.0], [0.5, 0.0, 0.0, 0.0], [100.0, 100.0, 0.0, 0.0]]], np.float32)
    )
    valid = jnp.ones((1, 3), dtype=bool)
    size = jnp.asarray(np.tile(np.array([4.0, 2.0, 1.5], np.float32), (1, 3, 1)))
    reward, _ = R.differentiable_reward(cfg, valid, state, None, None, size)
    r = np.asarray(reward)[0]
    assert r[0] < -0.5 and r[1] < -0.5  # overlapping pair penalized
    assert r[2] == 0.0  # distant agent unaffected


def test_reward_gradient_flows():
    cfg = R.RewardConfig()

    def loss(xy):
        state = jnp.concatenate([xy, jnp.zeros((1, 1, 2))], axis=-1)
        gt = jnp.ones((1, 1, 4))
        valid = jnp.ones((1, 1), dtype=bool)
        r, _ = R.differentiable_reward(cfg, valid, state, valid, gt, jnp.ones((1, 1, 3)))
        return -jnp.sum(r)

    g = jax.grad(loss)(jnp.zeros((1, 1, 2)))
    assert np.abs(np.asarray(g)).sum() > 0
