"""Checkpoint ergonomics: resume=best|last|<path>, backward-compat restore,
and the reference's `model_overrides` recipe (restore params, override
post-processing via CLI) — ref run.py:33-47, configs/resume/submission.yaml.
"""
import json
import os

import numpy as np
import pytest

from trafficbots_tpu.run import main, _resolve_resume
from test_resume import TINY_OVERRIDES


def test_resolve_resume_names_and_paths(tmp_path):
    from trafficbots_tpu.training.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    # no checkpoints yet -> named targets resolve to None
    assert _resolve_resume(ckpt, "last", default="last") is None
    assert _resolve_resume(ckpt, "1", default="last") is None
    # a saved state makes them resolvable
    state = {"params": {"w": np.ones(3, np.float32)}}
    ckpt._save("last", state)
    ckpt._save("best", state)
    assert _resolve_resume(ckpt, "1", default="last") == "last"
    assert _resolve_resume(ckpt, "true", default="best") == "best"
    assert _resolve_resume(ckpt, "best", default="last") == "best"
    # an explicit path outside the managed directory
    ext = str(tmp_path / "elsewhere")
    ckpt2 = CheckpointManager(ext)
    ckpt2._save("last", state)
    path = os.path.join(ext, "last")
    assert _resolve_resume(ckpt, path, default="last") == path
    got = ckpt.restore(path, {"params": {"w": np.zeros(3, np.float32)}})
    np.testing.assert_array_equal(got["params"]["w"], np.ones(3))


def test_restore_trainer_state_backward_compat(tmp_path):
    """A pre-round-3 checkpoint ({params, opt_state} only) must resume with
    epoch=0 instead of crashing on the strict template (ADVICE round 2)."""
    from trafficbots_tpu.training.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    old_state = {"params": {"w": np.ones(3, np.float32)},
                 "opt_state": {"m": np.zeros(3, np.float32)}}
    ckpt._save("last", old_state)
    target = {"params": {"w": np.zeros(3, np.float32)},
              "opt_state": {"m": np.ones(3, np.float32)},
              "epoch": np.asarray(0), "global_step": np.asarray(0),
              "rng": np.zeros(2, np.uint32)}
    out = ckpt.restore_trainer_state("last", target)
    np.testing.assert_array_equal(out["params"]["w"], np.ones(3))
    np.testing.assert_array_equal(out["opt_state"]["m"], np.zeros(3))
    assert int(out["epoch"]) == 0 and int(out["global_step"]) == 0


def test_restore_superset_fallback_rejects_shape_mismatch(tmp_path):
    """The superset fallback must not paper over a genuine config mismatch:
    restoring a checkpoint trained at different model dims fails AT RESTORE
    with a clear error, not deep inside model.apply."""
    from trafficbots_tpu.training.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt._save("last", {"params": {"w": np.ones((3, 4), np.float32)},
                        "extra": np.zeros(2, np.float32)})
    # superset restore (params only) works when shapes agree
    got = ckpt.restore("last", {"params": {"w": np.zeros((3, 4), np.float32)}})
    np.testing.assert_array_equal(got["params"]["w"], np.ones((3, 4)))
    # ... and raises when the target's shapes differ
    with pytest.raises(ValueError, match="incompatible"):
        ckpt.restore("last", {"params": {"w": np.zeros((3, 8), np.float32)}})


def test_model_overrides_recipe(tmp_path):
    """The submission recipe: fit, then validate restoring `last` by explicit
    path with post-processing overridden on the CLI (the reference's
    `model_overrides: waymo_post_processing.k_pred=...` analog)."""
    run = str(tmp_path / "run")
    main(["action=fit", f"run_dir={run}", "n_epochs=1"] + TINY_OVERRIDES)
    ckpt_path = os.path.join(run, "ckpt", "last")
    assert os.path.isdir(ckpt_path)

    run2 = str(tmp_path / "run2")
    main([
        "action=validate", f"run_dir={run2}", f"resume={ckpt_path}",
        "post_processing.k_pred=2", "post_processing.score_temperature=10",
    ] + TINY_OVERRIDES)
    # the validate run logged epoch metrics under the new run_dir
    mpath = os.path.join(run2, "metrics.jsonl")
    assert os.path.exists(mpath)
    rows = [json.loads(l) for l in open(mpath)]
    assert any("val/loss" in r for r in rows)


def test_checkpoint_hook_fires_and_is_failure_isolated(tmp_path, monkeypatch):
    """TB_CKPT_HOOK / programmatic `hook`: the pluggable analog of the
    reference's wandb checkpoint-artifact upload (ModelCheckpointWB, ref
    callbacks/wandb_callbacks.py:26-73). Fired after best/last saves with
    (path, step, score, is_best); a raising hook warns and disables itself."""
    import sys
    import types
    import warnings

    from trafficbots_tpu.training.checkpoint import CheckpointManager

    calls = []
    ckpt = CheckpointManager(
        str(tmp_path / "ckpt"), hook=lambda *a: calls.append(a)
    )
    state = {"params": {"w": np.ones(3, np.float32)}}
    ckpt.save_last(state, step=5, metrics={"val/loss": -0.25})
    ckpt.save_if_best(state, step=5, metrics={"val/loss": -0.25})
    # worse score: best not re-saved, no extra hook call
    ckpt.save_if_best(state, step=6, metrics={"val/loss": 0.5})
    assert len(calls) == 2
    path, step, score, is_best = calls[0]
    assert path.endswith("last") and step == 5 and score == -0.25 and not is_best
    assert calls[1][3] is True and calls[1][0].endswith("best")

    # env adapter resolves (default callable name `on_checkpoint`)
    env_calls = []
    mod = types.ModuleType("_fake_ckpt_mod")
    mod.on_checkpoint = lambda *a: env_calls.append(a)
    monkeypatch.setitem(sys.modules, "_fake_ckpt_mod", mod)
    monkeypatch.setenv("TB_CKPT_HOOK", "_fake_ckpt_mod")
    ckpt2 = CheckpointManager(str(tmp_path / "ckpt2"))
    ckpt2.save_last(state, step=1, metrics={"val/loss": 1.0})
    assert len(env_calls) == 1

    # a raising hook disables itself; the save itself survives
    def boom(*a):
        raise RuntimeError("uploader down")

    ckpt3 = CheckpointManager(str(tmp_path / "ckpt3"), hook=boom)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ckpt3.save_last(state, step=1, metrics={"val/loss": 1.0})
    assert any("checkpoint hook failed" in str(x.message) for x in w)
    assert ckpt3.hook is None
    assert ckpt3.exists("last")

    # a misconfigured env hook warns at construction and stays local-only
    monkeypatch.setenv("TB_CKPT_HOOK", "_no_such_module:nope")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert CheckpointManager(str(tmp_path / "ckpt4")).hook is None
    assert any("failed to load" in str(x.message) for x in w)
    monkeypatch.delenv("TB_CKPT_HOOK")


def test_checkpoint_self_describing(tmp_path):
    """A checkpoint copied OUT of its run keeps its hyperparameters: the
    config.json sidecar written into each save dir is found by resume= and
    reproduces the training config with zero re-typed config flags (the
    reference embeds hparams in the .ckpt via save_hyperparameters,
    ref waymo_motion.py:63)."""
    import shutil

    run = str(tmp_path / "run")
    main(["action=fit", f"run_dir={run}", "n_epochs=1"] + TINY_OVERRIDES)
    src = os.path.join(run, "ckpt", "best")
    assert os.path.isfile(os.path.join(src, "config.json"))
    # hand the trained model around: bare checkpoint dir, no run_dir context
    copy = str(tmp_path / "handed_over")
    shutil.copytree(src, copy)

    run2 = str(tmp_path / "run2")
    # NO config flags — only the runner/data-source knobs (not part of the
    # config tree). Default hidden_dim is 128 vs the trained 64: restoring
    # under the default config would fail with a shape mismatch, so passing
    # proves the snapshot inside the checkpoint was used.
    main([
        "action=validate", f"run_dir={run2}", f"resume={copy}",
        "synthetic=true", "val_batches=1",
    ])
    rows = [json.loads(l) for l in open(os.path.join(run2, "metrics.jsonl"))]
    assert any("val/loss" in r for r in rows)
