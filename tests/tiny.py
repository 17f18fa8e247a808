"""Tiny config + synthetic batch for fast CPU integration tests."""
from dataclasses import replace

from trafficbots_tpu.config import (
    AgentInteractionConfig,
    AgentTemporalConfig,
    DataConfig,
    ExperimentConfig,
    GoalManagerConfig,
    GoalPredictorConfig,
    LatentEncoderConfig,
    ModelConfig,
    TransformerConfig,
)
from trafficbots_tpu.data.synthetic import synthetic_episode_batch


def tiny_config(n_step: int = 31, time_step_end: int = 30, **kwargs) -> ExperimentConfig:
    data = DataConfig(
        n_step=n_step, n_step_history=11, n_agent=4, n_agent_no_sim=8,
        n_pl=16, n_pl_node=10, n_tl=6, n_tl_stop=6, batch_size=2,
    )
    model = ModelConfig(
        hidden_dim=64,
        pe_dim=32,
        tf_cfg=TransformerConfig(d_model=64, n_head=2, d_feedforward=64),
        n_layer_tf_as2pl=1,
        n_layer_tf_as2tl=1,
        latent_encoder=LatentEncoderConfig(latent_dim=8),
        agent_temporal=AgentTemporalConfig(num_layers=1),
        agent_interaction=AgentInteractionConfig(n_layer=1),
        goal_manager=GoalManagerConfig(
            goal_predictor=GoalPredictorConfig(n_layer_gru=1)
        ),
    )
    base = ExperimentConfig(
        data=data, model=model, time_step_end=time_step_end, time_step_gt=time_step_end,
    )
    return replace(base, **kwargs) if kwargs else base


def tiny_batch(cfg: ExperimentConfig, n_scene: int = 2, seed: int = 0, **kwargs):
    return synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=seed, **kwargs)
