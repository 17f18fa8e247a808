"""Ablation presets must compile and train end-to-end (tiny shapes).

Covers the code paths the default config never touches: StateIntegrator
dynamics, unmasked GRU (TrafficSim), dummy latent/goal (SimNet),
categorical latents, goal_xy conditioning with per-step re-localization.
"""
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbots_tpu import orchestration as O
from trafficbots_tpu.config import ablation
from tiny import tiny_batch, tiny_config


def _tinyfy(cfg):
    base = tiny_config()
    return replace(
        cfg, data=base.data, model=replace(
            cfg.model,
            hidden_dim=base.model.hidden_dim, pe_dim=base.model.pe_dim
            if cfg.model.input_pe_encoder.pe_mode != "add" else base.model.hidden_dim,
            tf_cfg=base.model.tf_cfg,
            n_layer_tf_as2pl=1, n_layer_tf_as2tl=1,
            latent_encoder=replace(
                base.model.latent_encoder,
                latent_prior=cfg.model.latent_encoder.latent_prior,
                latent_post=cfg.model.latent_encoder.latent_post,
            ),
            agent_temporal=replace(base.model.agent_temporal, kind=cfg.model.agent_temporal.kind),
            agent_interaction=base.model.agent_interaction,
            goal_manager=replace(
                cfg.model.goal_manager,
                goal_predictor=base.model.goal_manager.goal_predictor,
            ),
        ),
        time_step_end=base.time_step_end, time_step_gt=base.time_step_gt,
    )


@pytest.mark.parametrize("name", ["trafficsim", "simnet"])
def test_ablation_training_step(name):
    cfg = _tinyfy(ablation(name))
    batch_np = tiny_batch(cfg)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
    loss, metrics = jax.jit(
        lambda p, b, k: O.training_step(cfg, model, p, b, k)
    )(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), f"{name}: non-finite loss"
    if name == "simnet":
        assert "vae_kl_sum" not in metrics  # no latent loss without CVAE


def test_categorical_latent_kl_balance():
    """Unit coverage of the latent_cat path's loss math (balanced two-sided
    KL over MultiCategorical with straight-through samples) — the full
    integration is exercised by the scan paths shared with trafficsim."""
    from trafficbots_tpu.distributions import MultiCategorical, kl_multi_categorical
    from trafficbots_tpu.training.loss import balanced_kl

    key = jax.random.PRNGKey(0)
    p = MultiCategorical(probs=jax.nn.softmax(jax.random.normal(key, (2, 3, 4, 5)), -1))
    q = MultiCategorical(probs=jnp.full((2, 3, 4, 5), 0.2))
    kl = kl_multi_categorical(p, q)
    assert kl.shape == (2, 3)
    assert (np.asarray(kl) >= 0).all()
    # balanced: alpha*KL(sg(p)||q) + (1-alpha)*KL(p||sg(q)), both clamped at
    # free nats; with identical dists the result equals the free-nats floor
    same = balanced_kl(p, p, alpha=0.8, free_nats=0.01)
    np.testing.assert_allclose(np.asarray(same), 0.01, rtol=1e-6)
    # gradient must flow to BOTH sides under balancing
    def f(logits):
        pp = MultiCategorical(probs=jax.nn.softmax(logits, -1))
        return jnp.sum(balanced_kl(pp, q, alpha=0.8, free_nats=0.0))
    g = jax.grad(f)(jax.random.normal(key, (2, 3, 4, 5)))
    assert np.abs(np.asarray(g)).sum() > 0
