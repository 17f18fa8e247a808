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
