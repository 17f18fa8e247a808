"""Orbax checkpointing: {params, opt_state, step/epoch, rng} with best/last.

Replaces the reference's PL ModelCheckpointWB (wandb_callbacks.py:26-73):
top-1 on the monitored score (val/loss = -mAP of joint future prediction,
waymo_motion.py:785-790) plus a rolling "last". Metadata mirrors the wandb
artifact score fields so resume semantics match (run.py:33-47).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


def _load_ckpt_hook():
    """Resolve the optional checkpoint-artifact hook from TB_CKPT_HOOK.

    Format "pkg.module:callable" (callable defaults to `on_checkpoint`). The
    callable receives (path, step, score, is_best) after every best/last
    save — the pluggable analog of the reference's wandb checkpoint-artifact
    upload (ModelCheckpointWB, ref callbacks/wandb_callbacks.py:26-73):
    point it at a wandb/GCS/S3 uploader without the framework depending on
    any of them. No-op when unset; failures are isolated like the metrics
    sink (utils/logging.py).
    """
    spec = os.environ.get("TB_CKPT_HOOK")
    if not spec:
        return None
    import importlib

    mod, _, fn = spec.partition(":")
    try:
        return getattr(importlib.import_module(mod), fn or "on_checkpoint")
    except Exception as e:  # bad spec must not kill the run
        import warnings

        warnings.warn(f"TB_CKPT_HOOK={spec!r} failed to load ({e!r}); "
                      "checkpoints stay local-only")
        return None


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        monitor: str = "val/loss",
        mode: str = "min",
        config: Optional[Dict[str, Any]] = None,
        hook=None,
    ):
        assert _HAS_ORBAX, "orbax is required for checkpointing"
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best_score: Optional[float] = None
        # config dict snapshotted INSIDE each checkpoint dir so a checkpoint
        # copied out of its run stays self-describing (the reference embeds
        # hparams in the .ckpt via save_hyperparameters, waymo_motion.py:63)
        self.config = config
        # `hook` (programmatic) wins over the TB_CKPT_HOOK env adapter
        self.hook = hook if hook is not None else _load_ckpt_hook()
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = os.path.join(self.directory, "meta.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self.best_score = meta.get("best_score")

    def _save(self, name: str, state: Dict[str, Any]) -> str:
        path = os.path.join(self.directory, name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        # sidecar written after the collective save finalizes the directory;
        # rank-0 only (same single-writer rule as meta.json). Orbax restore
        # only reads its own manifest files, so the extra json is inert.
        if self.config is not None and jax.process_index() == 0:
            with open(os.path.join(path, "config.json"), "w") as f:
                json.dump(self.config, f, indent=2)
        return path

    def _fire_hook(self, path: str, step: int, metrics: Dict[str, float], is_best: bool):
        if self.hook is None or jax.process_index() != 0:
            return
        try:
            self.hook(path, step, float(metrics.get(self.monitor, float("nan"))), is_best)
        except Exception as e:  # an uploader failure must not kill training
            import warnings

            warnings.warn(f"checkpoint hook failed ({e!r}); disabling it")
            self.hook = None

    def save_last(self, state: Dict[str, Any], step: int, metrics: Dict[str, float]):
        path = self._save("last", state)
        self._write_meta(step=step, metrics=metrics)
        self._fire_hook(path, step, metrics, is_best=False)

    def save_if_best(self, state: Dict[str, Any], step: int, metrics: Dict[str, float]) -> bool:
        score = float(metrics[self.monitor])
        improved = (
            self.best_score is None
            or (self.mode == "min" and score < self.best_score)
            or (self.mode == "max" and score > self.best_score)
        )
        if improved:
            self.best_score = score
            path = self._save("best", state)
            self._write_meta(step=step, metrics=metrics)
            self._fire_hook(path, step, metrics, is_best=True)
        return improved

    def _write_meta(self, step: int, metrics: Dict[str, float]):
        # Orbax's save is a collective (every process calls it; Orbax
        # coordinates the shard writes) but this sidecar json is NOT — on a
        # shared checkpoint dir concurrent writers would tear the file
        if jax.process_index() != 0:
            return
        with open(self._meta_path, "w") as f:
            json.dump(
                {"best_score": self.best_score, "step": step,
                 "metrics": {k: float(v) for k, v in metrics.items()}},
                f, indent=2,
            )

    def _path(self, name: str) -> str:
        """`name` is either a managed checkpoint name (best/last) or an
        explicit path to an Orbax checkpoint directory — the analog of the
        reference's resume.checkpoint flow (ref run.py:33-47)."""
        if name not in ("best", "last") and os.path.isdir(name):
            return os.path.abspath(name)
        return os.path.join(self.directory, name)

    def restore(self, name: str, target: Dict[str, Any]) -> Dict[str, Any]:
        """Restore `target`'s keys, tolerating checkpoints that carry MORE
        state than requested — e.g. a fit's `last` (full trainer state with
        epoch/rng) restored params-only by validate/test (the reference's
        `resume.checkpoint` submission recipe, ref run.py:33-47). Orbax's
        StandardCheckpointer rejects a target that is a strict subset of the
        stored tree, so fall back to reading the full tree and selecting."""
        try:
            return self._ckptr.restore(self._path(name), target=target)
        except ValueError as err:
            full = self._ckptr.restore(self._path(name), target=None)
            if any(k not in full for k in target):
                raise
            out = {k: full[k] for k in target}
            # the fallback exists ONLY for strict-superset checkpoints:
            # verify the selected subtrees match the target's structure and
            # leaf shapes so a genuine mismatch (checkpoint from a different
            # model config) still fails HERE with a clear error instead of
            # handing back incompatible params that crash deep in apply()
            t_leaves, t_def = jax.tree.flatten(target)
            o_leaves, o_def = jax.tree.flatten(out)
            if t_def != o_def:
                raise
            for tl, ol in zip(t_leaves, o_leaves):
                ts, os_ = getattr(tl, "shape", None), getattr(ol, "shape", None)
                if ts is not None and os_ is not None and tuple(ts) != tuple(os_):
                    raise ValueError(
                        f"checkpoint {name!r} is incompatible with the current "
                        f"model config: stored leaf shape {tuple(os_)} != "
                        f"target {tuple(ts)}"
                    ) from err
            return out

    def restore_trainer_state(self, name: str, target: Dict[str, Any]) -> Dict[str, Any]:
        """Restore a full trainer state, tolerating checkpoints written
        before epoch/global_step/rng were part of the state: those restore
        {params, opt_state} only and keep the target's counters (resume at
        epoch 0 instead of crashing on a strict template mismatch)."""
        try:
            return self._ckptr.restore(self._path(name), target=target)
        except ValueError:  # template/structure mismatch only — genuine IO or
            # corruption errors from the slim retry below still propagate
            slim = {"params": target["params"], "opt_state": target["opt_state"]}
            restored = self._ckptr.restore(self._path(name), target=slim)
            out = dict(target)
            out.update(restored)
            return out

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))
