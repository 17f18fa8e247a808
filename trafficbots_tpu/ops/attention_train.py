"""Training-path fused masked attention: custom-VJP Pallas kernel pair.

Round-3 decomposition (PERF.md): after the node-encoder train kernels, the
90-step rollout scan's forward+backward is the largest block of the train
step (~430 of 886 ms @ batch 32). Its backward is dominated by the in-scan
agents->map cross-attention (S=64 queries, T=1024 map tokens, 3 layers,
x90 steps): the eval fused core (ops/fused_attention.py) keeps scores in
VMEM only on the FORWARD — its custom VJP re-runs the plain-XLA reference
and differentiates that, so under BPTT every step re-materializes the
[B, H, S, T] logits in HBM several times (remat recompute + d_attn + dS).

This module gives the attention core a REAL backward kernel: dq/dk/dv are
computed per scene block with logits/attn recomputed in VMEM
(flash-attention-style rematerialization), so no [S, T] matrix ever
touches HBM in either direction. Attention-weight dropout runs INSIDE the
kernels via the TPU PRNG, re-seeded per (seed, grid-step, head) exactly
like ops/node_encoder_train.py, so forward and backward regenerate
identical masks without storing them — and the fused path no longer
disables itself when dropout is live (the reference applies
nn.Dropout to the softmax weights, ref attention.py:109-111 /
models/modules.py Attention; same Bernoulli(1-p)/(1-p) distribution,
different bits — documented in docs/divergences.md).

Semantics match models/modules.Attention exactly at p=0, including the
all-invalid-row NaN guard (ref attention.py:101-107,144-146): guard rows
are computed with the mask lifted and their OUTPUT zeroed, and the same
zeroing is applied to the incoming cotangent in the backward (the XLA
autodiff of `jnp.where(no_valid, 0, out)` does exactly that).

Backward math (softmax/dropout/matmul VJPs, per head):
    out_h = (attn_h * m_h) @ v_h,  attn_h = softmax(q_h k_h^T * scale + M)
    dv_h    = (attn_h * m_h)^T @ g_h
    d_attn  = (g_h @ v_h^T) * m_h
    dS      = attn_h * (d_attn - rowsum(d_attn * attn_h))
    dq_h    = dS @ k_h * scale ;  dk_h = dS^T @ q_h * scale
(The additive -1e30 mask M is constant => contributes nothing to dS.)
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

import os as _os

_SB_OVERRIDE = (
    int(_os.environ["TB_ATTN_TRAIN_SB"]) if "TB_ATTN_TRAIN_SB" in _os.environ else None
)

from .kernel_common import COMPILER_PARAMS as _COMPILER_PARAMS
# site-index contract for this module: dense path uses
# grid-step * 1024 + scene-in-block * n_head + head; query-blocked path uses
# (scene * n_sblocks + sblock) * 64 + head — forward and backward must agree.
from .kernel_common import dropout_mask as _dropout_mask


def _scene_consts(inv):
    """inv [S, T] float 1.0=masked -> (no_valid [S,1], use_mask [S,T])."""
    no_valid = jnp.min(inv, axis=-1, keepdims=True)  # 1.0 iff ALL masked
    use_mask = inv * (1.0 - no_valid)  # NaN guard: lift mask on dead rows
    return no_valid, use_mask


def _fwd_kernel(flag_ref, q_ref, k_ref, v_ref, inv_ref, seed_ref, o_ref,
                *, n_head: int, block_b: int, p: float):
    # scalar-prefetched any-live flag per grid step: skip scene groups whose
    # query rows are ALL dead (padding slots / no valid target) — their
    # outputs are zeroed by the caller either way
    @pl.when(flag_ref[pl.program_id(0)] == 0)
    def _skip():
        o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

    @pl.when(flag_ref[pl.program_id(0)] != 0)
    def _compute():
        _fwd_dense_body(q_ref, k_ref, v_ref, inv_ref, seed_ref, o_ref,
                        n_head=n_head, block_b=block_b, p=p)


def _fwd_dense_body(q_ref, k_ref, v_ref, inv_ref, seed_ref, o_ref,
                    *, n_head: int, block_b: int, p: float):
    d_head = q_ref.shape[-1] // n_head
    scale = 1.0 / math.sqrt(d_head)
    for b in range(block_b):
        q, k, v = q_ref[b], k_ref[b], v_ref[b]
        inv = inv_ref[b].astype(jnp.float32)
        no_valid, use_mask = _scene_consts(inv)
        outs = []
        for h in range(n_head):
            sl = slice(h * d_head, (h + 1) * d_head)
            logits = jax.lax.dot_general(
                q[:, sl], k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits * scale + use_mask * jnp.float32(_NEG)
            attn = jax.nn.softmax(logits, axis=-1)
            if p > 0:
                attn = attn * _dropout_mask(attn.shape, pl.program_id(0) * 1024 + b * n_head + h, p, seed_ref)
            outs.append(jnp.dot(attn, v[:, sl], preferred_element_type=jnp.float32))
        o = jnp.concatenate(outs, axis=-1)
        o_ref[b] = o * (1.0 - no_valid)


def _bwd_kernel(flag_ref, q_ref, k_ref, v_ref, inv_ref, seed_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, n_head: int, block_b: int, p: float):
    # dead scene groups: upstream g is 0 (callers zero dead rows), every
    # grad term is linear in g -> all three grads are exactly zero
    @pl.when(flag_ref[pl.program_id(0)] == 0)
    def _skip():
        dq_ref[:] = jnp.zeros(dq_ref.shape, jnp.float32)
        dk_ref[:] = jnp.zeros(dk_ref.shape, jnp.float32)
        dv_ref[:] = jnp.zeros(dv_ref.shape, jnp.float32)

    @pl.when(flag_ref[pl.program_id(0)] != 0)
    def _compute():
        _bwd_dense_body(q_ref, k_ref, v_ref, inv_ref, seed_ref, g_ref,
                        dq_ref, dk_ref, dv_ref,
                        n_head=n_head, block_b=block_b, p=p)


def _bwd_dense_body(q_ref, k_ref, v_ref, inv_ref, seed_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, *, n_head: int, block_b: int, p: float):
    d_head = q_ref.shape[-1] // n_head
    scale = 1.0 / math.sqrt(d_head)
    for b in range(block_b):
        q, k, v = q_ref[b], k_ref[b], v_ref[b]
        inv = inv_ref[b].astype(jnp.float32)
        no_valid, use_mask = _scene_consts(inv)
        g = g_ref[b] * (1.0 - no_valid)  # VJP of the guard-row output zeroing
        dqs, dks, dvs = [], [], []
        for h in range(n_head):
            sl = slice(h * d_head, (h + 1) * d_head)
            logits = jax.lax.dot_general(
                q[:, sl], k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits * scale + use_mask * jnp.float32(_NEG)
            attn = jax.nn.softmax(logits, axis=-1)  # [S, T]
            g_h = g[:, sl]
            if p > 0:
                m = _dropout_mask(attn.shape, pl.program_id(0) * 1024 + b * n_head + h, p, seed_ref)
                attn_do = attn * m
            else:
                m = None
                attn_do = attn
            # dv = attn_do^T @ g_h
            dvs.append(jax.lax.dot_general(
                attn_do, g_h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            # d_attn = g_h @ v_h^T (through the dropout scaling)
            dattn = jax.lax.dot_general(
                g_h, v[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if m is not None:
                dattn = dattn * m
            dS = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
            dqs.append(jnp.dot(dS, k[:, sl], preferred_element_type=jnp.float32) * scale)
            dks.append(jax.lax.dot_general(
                dS, q[:, sl], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale)
        dq_ref[b] = jnp.concatenate(dqs, axis=-1)
        dk_ref[b] = jnp.concatenate(dks, axis=-1)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)


def _pick_block(B, S, T, D, itemsize=4):
    """Scenes per grid step, bounded by the backward's VMEM working set
    (k/v + dk/dv [T, D] x4, q/g/dq [S, D], one head's [S, T] temporaries
    x~4, masks) under the 64 MB limit with headroom."""
    per_scene = 4 * T * D * itemsize + 4 * S * D * itemsize + 6 * S * T * itemsize
    return next((g for g in (8, 4, 2, 1) if B % g == 0 and g * per_scene < 24 * 2**20), None)


def _pick_sblock(S, T, D, itemsize=4):
    """Query-block rows per grid step for scenes too big for _pick_block
    (episode-level attentions, e.g. the latent as2pl at S=1216 x T=1024):
    k/v stay whole per scene, each grid step handles an SB-row query slice
    plus the shared dk/dv accumulators.

    TB_ATTN_TRAIN_SB (env, A/B tooling) overrides the block size — finer
    blocks let the dead-row skip fire on strided validity patterns (the
    latent as2pl's live rows recur with period n_agent)."""
    def fits(sb):
        return (4 * T * D + 3 * sb * D + 6 * sb * T) * itemsize < 24 * 2**20

    if _SB_OVERRIDE is not None and S % _SB_OVERRIDE == 0 and fits(_SB_OVERRIDE):
        return _SB_OVERRIDE
    return next((sb for sb in (256, 128, 64, 32) if S % sb == 0 and fits(sb)), None)


# ----------------------------------------------------- query-blocked kernels
def _qb_site(h):
    # absolute dropout-site index for query-blocked grids: (scene, s-block)
    # folded so no two (scene, s-block, head) triples collide
    return (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) * 64 + h


def _fwd_kernel_qb(flag_ref, q_ref, k_ref, v_ref, inv_ref, seed_ref, o_ref,
                   *, n_head: int, p: float):
    """Grid (B, S/SB): one scene's k/v whole, one SB-row query slice. The
    NaN guard is row-local, so it works per slice unchanged. Dead query
    blocks (scalar-prefetched flag) write zeros and skip."""
    @pl.when(flag_ref[pl.program_id(0), pl.program_id(1)] == 0)
    def _skip():
        o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

    @pl.when(flag_ref[pl.program_id(0), pl.program_id(1)] != 0)
    def _compute():
        _fwd_qb_body(q_ref, k_ref, v_ref, inv_ref, seed_ref, o_ref,
                     n_head=n_head, p=p)


def _fwd_qb_body(q_ref, k_ref, v_ref, inv_ref, seed_ref, o_ref,
                 *, n_head: int, p: float):
    d_head = q_ref.shape[-1] // n_head
    scale = 1.0 / math.sqrt(d_head)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    inv = inv_ref[0].astype(jnp.float32)
    no_valid, use_mask = _scene_consts(inv)
    outs = []
    for h in range(n_head):
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale + use_mask * jnp.float32(_NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        if p > 0:
            attn = attn * _dropout_mask(attn.shape, _qb_site(h), p, seed_ref)
        outs.append(jnp.dot(attn, v[:, sl], preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1) * (1.0 - no_valid)


def _bwd_kernel_qb(flag_ref, q_ref, k_ref, v_ref, inv_ref, seed_ref, g_ref,
                   dq_ref, dk_ref, dv_ref, *, n_head: int, p: float):
    """Query-blocked backward: dq per slice; dk/dv accumulate across the
    s-blocks of one scene (the inner grid dim — TPU grids run sequentially,
    and the dk/dv output block is revisited for every s of the same b).
    Dead query blocks contribute exactly zero (g rows are zero) and skip;
    the dk/dv zero-init at s == 0 runs regardless."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    @pl.when(flag_ref[pl.program_id(0), pl.program_id(1)] == 0)
    def _skip():
        dq_ref[:] = jnp.zeros(dq_ref.shape, jnp.float32)

    @pl.when(flag_ref[pl.program_id(0), pl.program_id(1)] != 0)
    def _compute():
        _bwd_qb_body(q_ref, k_ref, v_ref, inv_ref, seed_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, n_head=n_head, p=p)


def _bwd_qb_body(q_ref, k_ref, v_ref, inv_ref, seed_ref, g_ref,
                 dq_ref, dk_ref, dv_ref, *, n_head: int, p: float):
    d_head = q_ref.shape[-1] // n_head
    scale = 1.0 / math.sqrt(d_head)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    inv = inv_ref[0].astype(jnp.float32)
    no_valid, use_mask = _scene_consts(inv)
    g = g_ref[0] * (1.0 - no_valid)

    dqs = []
    for h in range(n_head):
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale + use_mask * jnp.float32(_NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        g_h = g[:, sl]
        if p > 0:
            m = _dropout_mask(attn.shape, _qb_site(h), p, seed_ref)
            attn_do = attn * m
        else:
            m = None
            attn_do = attn
        dv_ref[0, :, h * d_head:(h + 1) * d_head] += jax.lax.dot_general(
            attn_do, g_h, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dattn = jax.lax.dot_general(
            g_h, v[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if m is not None:
            dattn = dattn * m
        dS = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
        dqs.append(jnp.dot(dS, k[:, sl], preferred_element_type=jnp.float32) * scale)
        dk_ref[0, :, h * d_head:(h + 1) * d_head] += jax.lax.dot_general(
            dS, q[:, sl], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)


from .kernel_common import row_live as _row_live  # noqa: E402  (one liveness definition)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention_train(q, k, v, invalid, seed, n_head: int, p: float,
                          src_invalid=None):
    """Differentiable masked MHA core with in-kernel attention dropout.

    q [B,S,D], k/v [B,T,D] fp32; invalid [B,S,T] bool (True = disallowed
    target); seed: int32 scalar (may be traced — derived from the flax
    dropout rng per call, so every scan step draws fresh masks). Returns
    [B,S,D]. Use only when fused_attention_train_fits (caller gates);
    p=0 skips the PRNG entirely (works in interpret mode).

    `src_invalid` [B,S] (optional) marks dead query rows (padding slots):
    blocks of them skip in fwd AND bwd. Exact where consumed — callers zero
    those rows before any consumer (ref transformer.py:236-239), so their
    outputs are masked and their upstream grads are zero.
    """
    return _call_fwd(q, k, v, invalid, n_head, p, seed, src_invalid)


def _call_fwd(q, k, v, invalid, n_head, p, seed, src_invalid=None):
    B, S, D = q.shape
    T = k.shape[1]
    G = _pick_block(B, S, T, D)
    interpret = jax.default_backend() != "tpu"
    live = _row_live(invalid, src_invalid)
    if G is None:
        SB = _pick_sblock(S, T, D)
        assert SB is not None, "caller must gate on fused_attention_train_fits"
        flags = jnp.any(live.reshape(B, S // SB, SB), axis=-1).astype(jnp.int32)
        kernel = functools.partial(_fwd_kernel_qb, n_head=n_head, p=p)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, S // SB),
                in_specs=[
                    pl.BlockSpec((1, SB, D), lambda b, s, f: (b, s, 0)),
                    pl.BlockSpec((1, T, D), lambda b, s, f: (b, 0, 0)),
                    pl.BlockSpec((1, T, D), lambda b, s, f: (b, 0, 0)),
                    pl.BlockSpec((1, SB, T), lambda b, s, f: (b, s, 0)),
                    pl.BlockSpec((1,), lambda b, s, f: (0,), memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((1, SB, D), lambda b, s, f: (b, s, 0)),
            ),
            interpret=interpret,
            **_COMPILER_PARAMS,
        )(flags, q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
          invalid.astype(jnp.int8), jnp.asarray(seed, jnp.int32).reshape(1))
    flags = jnp.any(live.reshape(B // G, G * S), axis=-1).astype(jnp.int32)
    kernel = functools.partial(_fwd_kernel, n_head=n_head, block_b=G, p=p)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, S, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((G, T, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((G, T, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((G, S, T), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((1,), lambda b, f: (0,), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((G, S, D), lambda b, f: (b, 0, 0)),
        ),
        interpret=interpret,
        **_COMPILER_PARAMS,
    )(flags, q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
      invalid.astype(jnp.int8), jnp.asarray(seed, jnp.int32).reshape(1))


def fused_attention_train_fits(B, S, T, D) -> bool:
    return _pick_block(B, S, T, D) is not None or _pick_sblock(S, T, D) is not None


def _vjp_fwd(q, k, v, invalid, seed, n_head, p, src_invalid=None):
    out = _call_fwd(q, k, v, invalid, n_head, p, seed, src_invalid)
    return out, (q, k, v, invalid, seed, src_invalid)


def _vjp_bwd(n_head, p, res, g):
    q, k, v, invalid, seed, src_invalid = res
    B, S, D = q.shape
    T = k.shape[1]
    G = _pick_block(B, S, T, D)
    interpret = jax.default_backend() != "tpu"
    live = _row_live(invalid, src_invalid)
    if G is None:
        SB = _pick_sblock(S, T, D)
        flags = jnp.any(live.reshape(B, S // SB, SB), axis=-1).astype(jnp.int32)
        kernel = functools.partial(_bwd_kernel_qb, n_head=n_head, p=p)
        dq, dk, dv = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B, S, D), jnp.float32),
                jax.ShapeDtypeStruct((B, T, D), jnp.float32),
                jax.ShapeDtypeStruct((B, T, D), jnp.float32),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, S // SB),
                in_specs=[
                    pl.BlockSpec((1, SB, D), lambda b, s, f: (b, s, 0)),
                    pl.BlockSpec((1, T, D), lambda b, s, f: (b, 0, 0)),
                    pl.BlockSpec((1, T, D), lambda b, s, f: (b, 0, 0)),
                    pl.BlockSpec((1, SB, T), lambda b, s, f: (b, s, 0)),
                    pl.BlockSpec((1,), lambda b, s, f: (0,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, SB, D), lambda b, s, f: (b, s, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, SB, D), lambda b, s, f: (b, s, 0)),
                    # dk/dv: one block per scene, revisited (and accumulated)
                    # across the inner s-grid — TPU grids run sequentially
                    pl.BlockSpec((1, T, D), lambda b, s, f: (b, 0, 0)),
                    pl.BlockSpec((1, T, D), lambda b, s, f: (b, 0, 0)),
                ),
            ),
            interpret=interpret,
            **_COMPILER_PARAMS,
        )(flags, q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
          invalid.astype(jnp.int8), jnp.asarray(seed, jnp.int32).reshape(1),
          g.astype(jnp.float32))
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                None, None, None)
    flags = jnp.any(live.reshape(B // G, G * S), axis=-1).astype(jnp.int32)
    kernel = functools.partial(_bwd_kernel, n_head=n_head, block_b=G, p=p)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, S, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((G, T, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((G, T, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((G, S, T), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((1,), lambda b, f: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((G, S, D), lambda b, f: (b, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((G, S, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((G, T, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((G, T, D), lambda b, f: (b, 0, 0)),
            ),
        ),
        interpret=interpret,
        **_COMPILER_PARAMS,
    )(flags, q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
      invalid.astype(jnp.int8), jnp.asarray(seed, jnp.int32).reshape(1),
      g.astype(jnp.float32))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None, None)


fused_attention_train.defvjp(_vjp_fwd, _vjp_bwd)


def dump_attn_dropout_masks(B, S, T, n_head, p, seed, G=None, interpret=False):
    """Regenerate the exact per-(scene, head) dropout masks the train
    kernels draw — test support for the exact-mask oracle. Returns
    [B, n_head, S, T]."""
    if G is None:
        G = _pick_block(B, S, T, 128)

    def kernel(seed_ref, m_ref):
        for b in range(G):
            for h in range(n_head):
                m_ref[b, h] = _dropout_mask((S, T), pl.program_id(0) * 1024 + b * n_head + h, p, seed_ref)

    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        out_shape=jax.ShapeDtypeStruct((B, n_head, S, T), jnp.float32),
        in_specs=[pl.BlockSpec((1,), lambda b: (0,), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((G, n_head, S, T), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **_COMPILER_PARAMS,
    )(jnp.asarray(seed, jnp.int32).reshape(1))


def dump_attn_dropout_masks_qb(B, S, T, D, n_head, p, seed, interpret=False):
    """Mask dump for the query-blocked path (same (scene, s-block, head)
    seeding as the qb kernels). Returns [B, n_head, S, T]."""
    SB = _pick_sblock(S, T, D)

    def kernel(seed_ref, m_ref):
        for h in range(n_head):
            m_ref[0, h] = _dropout_mask((SB, T), _qb_site(h), p, seed_ref)

    return pl.pallas_call(
        kernel,
        grid=(B, S // SB),
        out_shape=jax.ShapeDtypeStruct((B, n_head, S, T), jnp.float32),
        in_specs=[pl.BlockSpec((1,), lambda b, s: (0,), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, n_head, SB, T), lambda b, s: (b, 0, s, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **_COMPILER_PARAMS,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
