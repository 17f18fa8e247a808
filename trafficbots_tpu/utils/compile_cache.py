"""Persistent XLA compilation cache, shared by every entry point.

The full-scale eval/train programs take minutes to compile (TPU over the
tunnel, or the 8-device virtual CPU mesh); the persistent cache makes a
repeat run seconds. Cache keys include the device topology and XLA flags,
so the two directories never collide across backends — but TPU and CPU
programs are kept in separate directories anyway so either can be wiped
independently:

- ``tpu`` -> <repo>/.jax_cache      (min compile time 1 s)
- ``cpu`` -> <repo>/.jax_cache_cpu  (min compile time 5 s — CPU compiles
  of tiny test programs are plentiful and cheap; only cache the big ones)

Call before the first jit compilation. Failure is swallowed: the cache is
an optimization, never a requirement (e.g. a read-only checkout).
"""
from __future__ import annotations

import os

_KINDS = {"tpu": (".jax_cache", 1.0), "cpu": (".jax_cache_cpu", 5.0)}


def enable_compile_cache(kind: str = "tpu") -> None:
    import jax

    dirname, min_secs = _KINDS[kind]
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(root, dirname))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    except Exception:
        pass
