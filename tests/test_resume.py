"""Full-resume equivalence + validation media rendering via the CLI runner.

VERDICT item: train 2 epochs must equal train 1 epoch + resume 1 epoch — the
checkpoint carries {params, opt_state, epoch, global_step, rng} so the LR
schedule, teacher-forcing schedule, data order and key stream continue
exactly (ref run.py:33-47 trainer-state resume).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbots_tpu.run import main

TINY_OVERRIDES = [
    "synthetic=true",
    "data.n_step=31",
    "data.n_agent=4",
    "data.n_agent_no_sim=8",
    "data.n_pl=16",
    "data.n_pl_node=10",
    "data.n_tl=6",
    "data.n_tl_stop=6",
    "data.batch_size=8",  # divisible by the 8-device test mesh
    "time_step_end=30",
    "time_step_gt=30",
    "model.hidden_dim=64",
    "model.pe_dim=32",
    "model.tf_cfg.d_model=64",
    "model.tf_cfg.n_head=2",
    "model.tf_cfg.d_feedforward=64",
    "model.n_layer_tf_as2pl=1",
    "model.n_layer_tf_as2tl=1",
    "model.latent_encoder.latent_dim=8",
    "model.agent_temporal.num_layers=1",
    "model.agent_interaction.n_layer=1",
    "model.goal_manager.goal_predictor.n_layer_gru=1",
    "steps_per_epoch=2",
    "val_batches=1",
    "n_video_batch=0",
]


def _restore_params(run_dir):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(run_dir), "ckpt", "last")
    return ckptr.restore(path)


def test_resume_matches_uninterrupted_training(tmp_path):
    run_a = str(tmp_path / "a")
    run_b = str(tmp_path / "b")

    # A: 2 epochs straight through
    main(["action=fit", f"run_dir={run_a}", "n_epochs=2"] + TINY_OVERRIDES)
    # B: 1 epoch, then resume for the 2nd
    main(["action=fit", f"run_dir={run_b}", "n_epochs=1"] + TINY_OVERRIDES)
    main(["action=fit", f"run_dir={run_b}", "n_epochs=2", "resume=last"] + TINY_OVERRIDES)

    state_a = _restore_params(run_a)
    state_b = _restore_params(run_b)
    assert int(state_a["epoch"]) == int(state_b["epoch"]) == 2
    assert int(state_a["global_step"]) == int(state_b["global_step"])
    np.testing.assert_array_equal(np.asarray(state_a["rng"]), np.asarray(state_b["rng"]))
    for pa, pb in zip(jax.tree.leaves(state_a["params"]), jax.tree.leaves(state_b["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=0, rtol=0)


def test_validation_media_rendering(tmp_path):
    """validate with n_video_batch>0 produces mp4 + png artifacts."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from tiny import tiny_config, tiny_batch
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.evaluation_loop import render_validation_media

    cfg = tiny_config()
    batch = tiny_batch(cfg)
    model, params = O.init_params(
        cfg, jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()}
    )
    out_dir = str(tmp_path / "videos")
    paths = render_validation_media(
        cfg, model, params, lambda: iter([batch]), jax.random.PRNGKey(1),
        out_dir=out_dir, n_batches=1,
    )
    assert any(p.endswith(".mp4") for p in paths), paths
    assert any("attn_pl" in p for p in paths), paths
    assert any(p.endswith(".png") for p in paths), paths
    for p in paths:
        assert os.path.getsize(p) > 0
