"""Distribution pytree tests: log_prob golden values, mixed-det sampling,
straight-through gradients, K-future repeat semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from trafficbots_tpu.distributions import (
    DestCategorical,
    DiagGaussian,
    DummyLatent,
    Gaussian,
    MultiCategorical,
    kl_diag_gaussian,
)


def test_diag_gaussian_log_prob_golden():
    d = DiagGaussian(mean=jnp.zeros((2, 3)), log_std=jnp.zeros((2, 3)))
    # standard normal at 0: logp per dim = -0.5*log(2*pi); summed over 3 dims
    lp = np.asarray(d.log_prob(jnp.zeros((2, 3))))
    np.testing.assert_allclose(lp, 3 * (-0.5 * np.log(2 * np.pi)), rtol=1e-6)
    lp1 = np.asarray(d.log_prob(jnp.ones((2, 3))))
    np.testing.assert_allclose(lp1, lp - 1.5, rtol=1e-6)


def test_diag_gaussian_mixed_deterministic():
    mean = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    d = DiagGaussian(mean=mean, log_std=jnp.zeros((2, 3)))
    det_mask = jnp.array([True, False])
    s = d.sample(jax.random.PRNGKey(0), det_mask)
    np.testing.assert_allclose(np.asarray(s[0]), np.asarray(mean[0]))
    assert np.abs(np.asarray(s[1]) - np.asarray(mean[1])).max() > 1e-4


def test_kl_diag_gaussian_closed_form():
    p = DiagGaussian(mean=jnp.array([[1.0, 0.0]]), log_std=jnp.array([[0.0, 0.0]]))
    q = DiagGaussian(mean=jnp.array([[0.0, 0.0]]), log_std=jnp.array([[0.0, 0.0]]))
    # KL(N(1,1)||N(0,1)) = 0.5 per first dim
    np.testing.assert_allclose(float(kl_diag_gaussian(p, q)[0]), 0.5, rtol=1e-6)


def test_full_cov_gaussian_matches_diag_when_diagonal():
    std = jnp.array([0.5, 2.0])
    mean = jnp.array([[1.0, -1.0]])
    g = Gaussian(mean=mean, tril=jnp.diag(std)[None])
    d = DiagGaussian(mean=mean, log_std=jnp.log(std)[None])
    x = jnp.array([[0.3, 0.7]])
    np.testing.assert_allclose(
        float(g.log_prob(x)[0]), float(d.log_prob(x)[0]), rtol=1e-5
    )
    # deterministic sample = mean
    np.testing.assert_allclose(np.asarray(g.sample(jax.random.PRNGKey(0), True)), np.asarray(mean))


def test_multicategorical_straight_through_grad():
    def f(logits):
        probs = jax.nn.softmax(logits, axis=-1)
        d = MultiCategorical(probs=probs)
        s = d.sample(jax.random.PRNGKey(0), False)
        return jnp.sum(s * jnp.arange(s.shape[-1]))

    g = jax.grad(f)(jnp.zeros((1, 2, 4)))
    assert np.abs(np.asarray(g)).sum() > 0  # gradient flows through ST trick


def test_multicategorical_sample_is_onehot_flat():
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4)), axis=-1)
    d = MultiCategorical(probs=probs)
    s = np.asarray(d.sample(jax.random.PRNGKey(0), True))
    assert s.shape == (2, 12)
    np.testing.assert_allclose(s.reshape(2, 3, 4).sum(-1), 1.0, rtol=1e-6)


def test_dest_categorical_log_prob_and_repeat():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5))
    d = DestCategorical.from_logits(logits)
    idx = jnp.argmax(d.logits, axis=-1)
    lp = d.log_prob(idx)
    assert np.asarray(lp).shape == (2, 3)
    d2 = d.repeat(4, axis=0)
    assert d2.logits.shape == (8, 3, 5)
    np.testing.assert_allclose(np.asarray(d2.logits[0]), np.asarray(d2.logits[3]))
    np.testing.assert_allclose(np.asarray(d2.logits[0]), np.asarray(d.logits[0]))


def test_dummy_latent():
    d = DummyLatent(zeros=jnp.ones((2, 3, 4)))
    s = d.sample(jax.random.PRNGKey(0), False)
    np.testing.assert_allclose(np.asarray(s), 0.0)
    np.testing.assert_allclose(np.asarray(d.log_prob(s)), 0.0)
