"""Config persistence + resume ergonomics, and per-view dropout independence.

The reference embeds every hyperparameter in the checkpoint
(save_hyperparameters, ref waymo_motion.py:63) and re-instantiates the model
from the artifact with post-processing-only overrides on top
(ref run.py:40-44, configs/resume/submission.yaml). Here the analog is a
`config.json` snapshot in the run_dir, loaded as the BASE config whenever
`resume=` is given, with CLI overrides applied on top.
"""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trafficbots_tpu.config import (
    ExperimentConfig,
    ablation,
    config_from_dict,
    config_to_dict,
)
from trafficbots_tpu.run import parse_args, snapshot_config
from tiny import tiny_batch, tiny_config


def test_roundtrip_default():
    cfg = ExperimentConfig()
    assert config_from_dict(config_to_dict(cfg)) == cfg


def test_roundtrip_json_with_overrides_and_tuples():
    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg,
        seed=7,
        model=dataclasses.replace(cfg.model, hidden_dim=96),
        data=dataclasses.replace(cfg.data, batch_size=4),
    )
    # json round-trip turns tuples into lists; from_dict must restore them
    d = json.loads(json.dumps(config_to_dict(cfg)))
    back = config_from_dict(d)
    assert back == cfg
    assert isinstance(back.tf_reactive_replay.step_spawn_agent, type(cfg.tf_reactive_replay.step_spawn_agent))


def test_roundtrip_ablation():
    cfg = ablation("no_interaction")
    assert config_from_dict(json.loads(json.dumps(config_to_dict(cfg)))) == cfg


def test_unknown_key_raises():
    d = config_to_dict(ExperimentConfig())
    d["not_a_field"] = 1
    with pytest.raises(ValueError, match="unknown config keys"):
        config_from_dict(d)
    d2 = config_to_dict(ExperimentConfig())
    d2["model"]["bogus_flag"] = True
    with pytest.raises(ValueError, match="unknown config keys"):
        config_from_dict(d2)


def test_missing_keys_keep_defaults():
    # forward compatibility: an old snapshot missing a newly added field
    d = config_to_dict(ExperimentConfig())
    d.pop("seed")
    d["model"].pop("hidden_dim")
    cfg = config_from_dict(d)
    assert cfg.seed == ExperimentConfig().seed
    assert cfg.model.hidden_dim == ExperimentConfig().model.hidden_dim


def test_parse_args_loads_snapshot_with_overrides(tmp_path):
    run_dir = str(tmp_path / "run")
    trained = dataclasses.replace(
        ExperimentConfig(),
        seed=123,
        model=dataclasses.replace(ExperimentConfig().model, hidden_dim=96),
    )
    path = snapshot_config(trained, run_dir)
    assert os.path.isfile(path)

    # validate-from-run_dir reproduces the training config with ZERO
    # re-typed flags (ref run.py:40-44 resume flow)
    action, cfg, *_ = parse_args(
        ["action=validate", f"run_dir={run_dir}", "resume=best"]
    )
    assert action == "validate"
    assert cfg == trained

    # CLI overrides apply ON TOP of the snapshot (model_overrides analog)
    _, cfg2, *_ = parse_args(
        ["action=validate", f"run_dir={run_dir}", "resume=best", "seed=9"]
    )
    assert cfg2.seed == 9
    assert cfg2.model.hidden_dim == 96

    # explicit checkpoint path: snapshot found via the ckpt's parents
    ckpt_dir = os.path.join(run_dir, "ckpt", "last")
    os.makedirs(ckpt_dir, exist_ok=True)
    _, cfg3, *_ = parse_args(["action=test", f"resume={ckpt_dir}"])
    assert cfg3 == trained


def test_parse_args_without_resume_ignores_snapshot(tmp_path):
    # a fresh fit in an existing run_dir must NOT silently inherit the old
    # config — snapshots only load when resume= is given
    run_dir = str(tmp_path / "run")
    snapshot_config(dataclasses.replace(ExperimentConfig(), seed=55), run_dir)
    _, cfg, *_ = parse_args(["action=fit", f"run_dir={run_dir}"])
    assert cfg.seed == ExperimentConfig().seed


def test_per_view_dropout_draws_are_independent():
    """The reference calls each encoder view as a fresh module invocation,
    consuming torch's global RNG — same-shaped views never share dropout
    masks. Verify the per-view key folding (orchestration.py:137-140): with
    IDENTICAL view inputs, training-mode outputs differ across views, and
    eval-mode outputs are identical."""
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.data.preprocessing import pre_processing

    cfg = tiny_config()
    batch_np = tiny_batch(cfg)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
    pbatch = pre_processing(batch, cfg.model, training=True)
    # make the prior view bit-identical to the posterior view
    pbatch = dict(pbatch)
    for k in [k for k in pbatch if k.startswith("latent_post/")]:
        pbatch["latent_prior/" + k[len("latent_post/"):]] = pbatch[k]

    feats_train = O.encode_episode_features(
        model, params, pbatch, training=True, key=jax.random.PRNGKey(3)
    )
    diffs = [
        float(jnp.abs(feats_train["latent_post"][k] - feats_train["latent_prior"][k]).max())
        for k in ("agent_feature", "tl_feature")
    ]
    assert max(diffs) > 0, "identical views drew identical dropout masks"

    feats_eval = O.encode_episode_features(
        model, params, pbatch, training=False, key=None
    )
    for k in ("agent_feature", "tl_feature", "map_feature"):
        np.testing.assert_allclose(
            np.asarray(feats_eval["latent_post"][k]),
            np.asarray(feats_eval["latent_prior"][k]),
            rtol=0, atol=0,
        )
