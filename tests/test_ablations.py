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


@pytest.mark.parametrize("name", ["trafficsim", "simnet", "latent_cat"])
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
    if name == "latent_cat":
        assert float(metrics["vae_kl_count"]) > 0
