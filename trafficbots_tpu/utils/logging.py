"""Local experiment logging: JSONL metrics stream + profiling hooks.

Replaces the reference's wandb logging (configs/loggers/wandb.yaml,
callbacks/wandb_callbacks.py). Metrics append to `metrics.jsonl` per run;
`Profiler` wraps jax.profiler traces + wall-clock phase timing — the
tracing/observability subsystem the reference lacks (SURVEY.md section 5).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


def _load_metrics_hook():
    """Resolve the optional external metrics sink from TB_METRICS_HOOK.

    Format "pkg.module:callable" (callable defaults to `log_metrics`). The
    callable receives each record dict (step/phase/time + float metrics) —
    the pluggable analog of the reference's wandb logger
    (configs/loggers/wandb.yaml): point it at a wandb/TensorBoard/DB adapter
    without the framework depending on any of them. No-op when unset.
    """
    spec = os.environ.get("TB_METRICS_HOOK")
    if not spec:
        return None
    import importlib

    mod, _, fn = spec.partition(":")
    try:
        return getattr(importlib.import_module(mod), fn or "log_metrics")
    except Exception as e:  # bad spec must not kill the run (docs/usage.md)
        import warnings

        warnings.warn(f"TB_METRICS_HOOK={spec!r} failed to load ({e!r}); "
                      "metrics go to metrics.jsonl only")
        return None


class MetricsLogger:
    def __init__(self, run_dir: str, sink=None):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self.path = os.path.join(self.run_dir, "metrics.jsonl")
        # `sink` (programmatic) wins over the TB_METRICS_HOOK env adapter
        self.sink = sink if sink is not None else _load_metrics_hook()

    def log(self, metrics: Dict[str, Any], step: int, phase: str = "train"):
        rec = {"step": step, "phase": phase, "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.sink is not None:
            try:
                self.sink(rec)
            except Exception as e:  # a sink failure must not kill training
                import warnings

                warnings.warn(f"metrics sink failed ({e!r}); disabling it")
                self.sink = None


class Profiler:
    """Phase timing + optional jax.profiler device traces."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.trace_dir = trace_dir
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    @contextlib.contextmanager
    def device_trace(self, name: str = "trace"):
        import jax

        if self.trace_dir is None:
            yield
            return
        path = os.path.join(self.trace_dir, name)
        os.makedirs(path, exist_ok=True)
        jax.profiler.start_trace(path)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def summary(self) -> Dict[str, float]:
        return {
            f"time/{k}_mean_s": self.times[k] / max(self.counts[k], 1) for k in self.times
        }


def nan_guard(tree, name: str = "tree") -> bool:
    """Debug-mode NaN detection (replaces torch detect_anomaly;
    SURVEY.md section 5 'race detection / sanitizers')."""
    import jax
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")
    return True
