"""Shared helpers for the training-path Pallas kernels.

The in-kernel dropout recipe MUST stay bit-identical between each kernel's
forward and backward (masks are regenerated, never stored) — and the two
modules that use it (ops/attention_train.py, ops/node_encoder_train.py)
must not drift apart, so the seeding/threshold core lives here once.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

try:
    # bound VMEM so the compiler spills instead of failing on big blocks
    COMPILER_PARAMS = {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    }
except Exception:  # pragma: no cover - older pallas without CompilerParams
    COMPILER_PARAMS = {}


# TB_PAD_SKIP=0 forces every padding-skip flag live (attention query
# blocks, node-encoder polyline blocks, train dead-row skips): the kernels
# keep their structure but compute every block. The on-chip bisection lever
# when a skip variant misbehaves under Mosaic, and the safe mode while the
# skips are unverified on hardware. Read at import (trace) time.
import os as _os  # noqa: E402

PAD_SKIP_ENABLED = _os.environ.get("TB_PAD_SKIP", "1") != "0"


def row_live(invalid, src_invalid):
    """[B, S] live = real query row (not padding) with >=1 valid target.

    The ONE definition of query-row liveness that feeds every kernel's
    dead-block skip flags (eval fused_attention + train attention_train);
    if the notion of "dead row" ever changes, eval and train must move
    together or their skip semantics silently diverge. Under TB_PAD_SKIP=0
    every row reports live, so no block skips anywhere.
    """
    if not PAD_SKIP_ENABLED:
        return jnp.ones(invalid.shape[:-1], bool)
    live = ~jnp.all(invalid, axis=-1)
    if src_invalid is not None:
        live = live & ~src_invalid
    return live


def dropout_mask(shape, idx, p: float, seed_ref):
    """Inverted-dropout mask regenerable at any walk order.

    Re-seeds the TPU hardware PRNG per (seed, absolute site index): the
    forward and backward kernels compute `idx` identically, so the mask is
    reproduced exactly without storing it. `idx` must be unique per dropout
    site within one kernel launch (pltpu.prng_seed folds both values).
    """
    pltpu.prng_seed(seed_ref[0], idx)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = np.uint32(min(int(p * 2**32), 2**32 - 1))
    keep = (bits >= thresh).astype(jnp.float32)
    return keep * (1.0 / (1.0 - p))
