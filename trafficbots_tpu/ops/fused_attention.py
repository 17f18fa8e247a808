"""Fused masked multi-head attention core as a Pallas TPU kernel.

Motivation (measured on the 90-step rollout scan, batch 32, v-chip): the
per-step program is bound by device kernel count and the HBM round-trips of
the materialized [B, H, S, T] attention logits — not MXU FLOPs (bf16 ~= fp32,
layer-count ablations ~flat). This kernel folds

    logits = q @ k^T   ->  mask  ->  softmax  ->  out = attn @ v

into ONE kernel per layer, keeping the [S, T] score matrix in VMEM. The
shapes here are tiny and static (S = 64 agents, T <= 1024 map tokens,
d_model 128), so each (batch, scene) is a single block: no streaming, no
double buffering — grid is just the batch dimension.

Semantics match models/modules.Attention exactly, including the reference's
all-invalid-row NaN guard (ref attention.py:101-107,144-146): rows whose
targets are ALL masked are computed with the mask lifted and their output
zeroed afterwards.

Differentiation: wrapped in jax.custom_vjp whose backward recomputes the
plain-XLA reference forward and differentiates that — exact same math, so
gradients are identical to the unfused path; training pays one extra
(cheap) forward. Used only when attention-weight dropout is inactive.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_common import row_live

_NEG_INF = float("-inf")

# A/B escape hatch for perf tools: overrides every call's row_block at trace
# time (0 = auto query blocks with dead-block skipping, -1 = the round-2
# control: round-2 block choice — whole-S when it fits, else the largest
# fitting divisor — with the skip flags forced live, so the SAME Pallas
# kernel runs everywhere round 2 ran it and never silently falls back to
# XLA). Not for production use — set TB_ATTN_ROW_BLOCK in the env.
import os as _os

_ROW_BLOCK_OVERRIDE = (
    int(_os.environ["TB_ATTN_ROW_BLOCK"]) if "TB_ATTN_ROW_BLOCK" in _os.environ else None
)
_KV_BLOCK_OVERRIDE = (
    int(_os.environ["TB_ATTN_KV_BLOCK"]) if "TB_ATTN_KV_BLOCK" in _os.environ else None
)


def _attn_kernel(flag_ref, q_ref, k_ref, v_ref, inv_ref, o_ref, *, n_head: int, block_b: int):
    """block_b scenes per grid step: q [G, SB, D], k/v [G, T, D], inv
    [G, SB, T] int8, o [G, SB, D]. Batching scenes into one grid step
    amortizes the per-grid-step launch/pipeline overhead — this kernel runs
    90x per rollout inside the scan, so grid count is the cost driver.

    `flag_ref` is a scalar-prefetched [n_bgroups, n_qblocks] any-live flag:
    query blocks whose rows ALL lack a valid target (padding agents /
    padding polylines — fixed-capacity tensors with a variable real prefix)
    write zeros and skip the score/softmax/AV chain entirely. Bit-exact:
    the NaN-guard zeroes those rows' outputs on the compute path too.

    All mask logic is float arithmetic — boolean (i1) vectors trip Mosaic
    relayouts on non-native tile shapes. exp(x - 1e30) underflows to exactly
    0.0 in fp32, so the additive -1e30 mask equals the reference's -inf.
    """
    d_head = q_ref.shape[-1] // n_head
    scale = 1.0 / math.sqrt(d_head)

    @pl.when(flag_ref[pl.program_id(0), pl.program_id(1)] == 0)
    def _skip():
        o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)

    @pl.when(flag_ref[pl.program_id(0), pl.program_id(1)] != 0)
    def _compute():
        for b in range(block_b):
            q = q_ref[b]
            k = k_ref[b]
            v = v_ref[b]
            inv = inv_ref[b].astype(jnp.float32)  # [SB, T] 1.0 = masked target

            no_valid = jnp.min(inv, axis=-1, keepdims=True)  # [SB, 1] 1.0 iff all masked
            use_mask = inv * (1.0 - no_valid)  # NaN guard: lift mask on dead rows

            outs = []
            for h in range(n_head):
                sl = slice(h * d_head, (h + 1) * d_head)
                logits = jax.lax.dot_general(
                    q[:, sl], k[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [SB, T]
                logits = logits * scale + use_mask * jnp.float32(-1e30)
                attn = jax.nn.softmax(logits, axis=-1)
                outs.append(
                    jnp.dot(attn.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
                )
            o = jnp.concatenate(outs, axis=-1)
            o_ref[b] = (o * (1.0 - no_valid)).astype(o_ref.dtype)


def _flash_kv_kernel(fetch_ref, used_ref, q_ref, k_ref, v_ref, inv_ref, o_ref,
                     acc_ref, m_ref, l_ref, *, n_head: int, block_b: int):
    """Flash-style accumulation over K/V blocks with dead-block skipping.

    Grid (n_bgroups, n_kvblocks), kv innermost. `fetch_ref`/`used_ref` are
    scalar-prefetched [n_bgroups, n_kvblocks]: unused steps (all targets in
    the block masked for every query of the group) keep the previous block
    index in the k/v/inv index_maps — Pallas re-fetches a block only when
    its index CHANGES, so padded K/V never streams from HBM — and skip the
    whole update. Running (m, l, acc) live in VMEM scratch across the
    sequential kv steps; the output is finalized on the last step.

    NaN-guard semantics: rows with no valid target anywhere end with l == 0
    and finalize to 0 — the reference computes them mask-lifted and zeroes
    the output (attention.py:101-107,144-146), so consumers see the same.

    Exactness: within the gate `p = exp(s - m_new) * keep`, masked columns
    contribute exactly 0 and blocks only reorder the fp32 summation (same
    tolerance class as any softmax reassociation).
    """
    d_head = q_ref.shape[-1] // n_head
    scale = 1.0 / math.sqrt(d_head)
    j = pl.program_id(1)
    NT = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)

    @pl.when(used_ref[pl.program_id(0), j] != 0)
    def _update():
        for b in range(block_b):
            q = q_ref[b]
            k = k_ref[b]
            v = v_ref[b]
            inv = inv_ref[b].astype(jnp.float32)  # [S, TB] 1.0 = masked
            keep = 1.0 - inv
            for h in range(n_head):
                sl = slice(h * d_head, (h + 1) * d_head)
                s = jax.lax.dot_general(
                    q[:, sl], k[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + inv * jnp.float32(-1e30)
                m_old = m_ref[b, :, h][:, None]  # [S, 1]
                m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new) * keep
                alpha = jnp.exp(m_old - m_new)
                l_ref[b, :, h] = (l_ref[b, :, h][:, None] * alpha
                                  + jnp.sum(p, axis=-1, keepdims=True))[:, 0]
                acc_ref[b, :, sl] = acc_ref[b, :, sl] * alpha + jnp.dot(
                    p.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32
                )
                m_ref[b, :, h] = m_new[:, 0]

    @pl.when(j == NT - 1)
    def _finalize():
        for b in range(block_b):
            outs = []
            for h in range(n_head):
                sl = slice(h * d_head, (h + 1) * d_head)
                l = l_ref[b, :, h][:, None]
                outs.append(jnp.where(l > 0, acc_ref[b, :, sl] / jnp.maximum(l, 1e-30), 0.0))
            o_ref[b] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _flash_forward(q, k, v, invalid, n_head: int, kv_block: int):
    """Flash path entry: returns None when the shape does not qualify so the
    caller falls back to the single-shot kernel."""
    B, S, D = q.shape
    T = k.shape[1]
    TB = kv_block
    if T % TB != 0 or T // TB < 2:
        return None
    NT = T // TB
    interpret = jax.default_backend() != "tpu"
    # VMEM per scene: q+out+acc [S, D] x3 fp32ish, k/v block, inv + scores,
    # m/l [S, H] x2
    per_scene = 3 * S * D * 4 + 2 * TB * D * k.dtype.itemsize + 2 * S * TB * 5 + 2 * S * n_head * 4
    G = next((g for g in (4, 2, 1) if B % g == 0 and g * per_scene < 10 * 2**20), None)
    if G is None:
        return None

    from .kernel_common import PAD_SKIP_ENABLED

    if PAD_SKIP_ENABLED:
        col_used = ~jnp.all(invalid, axis=1)  # [B, T] some query allows col t
        used = jnp.any(col_used.reshape(B // G, G, NT, TB), axis=(1, 3))  # [Bg, NT]
    else:
        used = jnp.ones((B // G, NT), bool)
    idx = jnp.where(used, jnp.arange(NT, dtype=jnp.int32)[None, :], -1)
    fetch = jnp.maximum(jax.lax.cummax(idx, axis=1), 0).astype(jnp.int32)
    used = used.astype(jnp.int32)

    kernel = functools.partial(_flash_kv_kernel, n_head=n_head, block_b=G)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // G, NT),
            in_specs=[
                pl.BlockSpec((G, S, D), lambda b, j, ft, us: (b, 0, 0)),
                pl.BlockSpec((G, TB, D), lambda b, j, ft, us: (b, ft[b, j], 0)),
                pl.BlockSpec((G, TB, D), lambda b, j, ft, us: (b, ft[b, j], 0)),
                pl.BlockSpec((G, S, TB), lambda b, j, ft, us: (b, 0, ft[b, j])),
            ],
            out_specs=pl.BlockSpec((G, S, D), lambda b, j, ft, us: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, S, D), jnp.float32),
                pltpu.VMEM((G, S, n_head), jnp.float32),
                pltpu.VMEM((G, S, n_head), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(fetch, used, q, k, v, invalid.astype(jnp.int8))


def _xla_reference(q, k, v, invalid, n_head: int):
    """Plain-XLA forward with identical semantics (also the VJP recompute
    path; mirrors models/modules.Attention)."""
    B, S, D = q.shape
    T = k.shape[1]
    d_head = D // n_head
    qh = q.reshape(B, S, n_head, d_head)
    kh = k.reshape(B, T, n_head, d_head)
    vh = v.reshape(B, T, n_head, d_head)
    logits = jnp.einsum("bshd,bthd->bhst", qh, kh).astype(jnp.float32)
    no_valid = jnp.all(invalid, axis=-1)  # [B, S]
    use_mask = invalid & (~no_valid[..., None])
    logits = jnp.where(use_mask[:, None], _NEG_INF, logits)
    attn = jax.nn.softmax(logits / math.sqrt(d_head), axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", attn.astype(vh.dtype), vh).reshape(B, S, D)
    return jnp.where(no_valid[..., None], 0.0, out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention_core(q, k, v, invalid, src_invalid, n_head: int, row_block: int = 0,
                         kv_block: int = 0):
    """Masked MHA core: (q [B,S,D], k [B,T,D], v [B,T,D], invalid [B,S,T])
    -> [B,S,D]. `invalid` True = disallowed target (padding and/or attn
    mask already combined). `src_invalid` [B,S] (optional) marks dead QUERY
    rows (padding agent/polyline slots): blocks of them skip compute and
    output 0 — callers zero those rows downstream regardless (ref
    transformer.py:236-239), and their upstream grads are 0, so both values
    and gradients match the unskipped computation where they are consumed.
    `row_block`: query rows per grid step (0 = auto ~8 skip-granular
    blocks, -1 = round-2 A/B control: round-2 block choice with the skip
    flags forced live). `kv_block` > 0 selects
    the flash K/V-block path (_flash_forward): padded target blocks skip
    compute AND their HBM stream."""
    return _pallas_forward(q, k, v, invalid, src_invalid, n_head, row_block, kv_block)


def _pick_row_block(S: int, fits) -> Optional[int]:
    """Query-block rows per grid step: small enough for skip granularity
    (~8 blocks, floor 16 rows), a divisor of S (grid constraint), a multiple
    of 8 (f32 sublane tile) unless it is S itself, and VMEM-fitting. Returns
    None when even the smallest divisor exceeds VMEM."""
    if S <= 16:
        return S if fits(S) else None
    divs = [d for d in range(8, S + 1) if S % d == 0 and d % 8 == 0]
    if not divs:
        divs = [S]
    target = max(16, -(-S // 8))
    cands = [d for d in divs if d >= target and fits(d)]
    if cands:
        return min(cands)
    fallback = [d for d in divs if fits(d)]
    return max(fallback) if fallback else None


def _pallas_forward(q, k, v, invalid, src_invalid, n_head: int, row_block: int = 0,
                    kv_block: int = 0):
    B, S, D = q.shape
    T = k.shape[1]
    interpret = jax.default_backend() != "tpu"
    if _ROW_BLOCK_OVERRIDE is not None:  # measurement escape hatch (trace-time)
        row_block = _ROW_BLOCK_OVERRIDE
    if _KV_BLOCK_OVERRIDE is not None:
        kv_block = _KV_BLOCK_OVERRIDE
    if kv_block > 0:
        out = _flash_forward(q, k, v, invalid, n_head, kv_block)
        if out is not None:
            return out
    # VMEM budget per grid step (~16 MB scoped limit, leave headroom):
    # q+out (fp32-ish), k+v per scene, inv int8 + 2x fp32 scores per row
    kv_bytes = 2 * T * D * k.dtype.itemsize

    def fits_g(g, sb):
        return g * (sb * D * 8 + kv_bytes + sb * T * 9) < 12 * 2**20

    skip_off = row_block < 0  # A/B control: round-2 blocking, flags forced live
    if row_block > 0 and S % row_block == 0 and fits_g(1, row_block):
        SB = row_block
    elif skip_off:
        # round-2 block choice: one whole-S block when it fits, else the
        # largest fitting divisor (the round-2 SB search for the oversized
        # latent as2pl) — the control must run the same Pallas kernel round
        # 2 ran, never the XLA fallback, or the A/B measures kernel routing
        # instead of the skip
        if fits_g(1, S):
            SB = S
        else:
            SB = next(
                (d for d in range(S // 2, 31, -1)
                 if S % d == 0 and d % 8 == 0 and fits_g(1, d)),
                None,
            )
    else:
        SB = _pick_row_block(S, lambda sb: fits_g(1, sb))
    if SB is None:
        return _xla_reference(q, k, v, invalid, n_head)
    # scenes per grid step: amortizes per-grid-step launch/pipeline overhead
    # (measured neutral vs G=1 at full scale — kept for fewer grid launches)
    G = next(g for g in (4, 2, 1) if B % g == 0 and fits_g(g, SB))

    # any-live flag per (scene group, query block): a row is live iff it is
    # a real (non-padding) query AND has at least one valid target. Fixed-
    # capacity agent/polyline slots past the real prefix are dead, so whole
    # blocks of them skip.
    if skip_off:
        live = jnp.ones((B, S), bool)
    else:
        live = row_live(invalid, src_invalid)
    flags = (
        live.reshape(B // G, G, S // SB, SB)
        .any(axis=(1, 3))
        .astype(jnp.int32)
    )

    kernel = functools.partial(_attn_kernel, n_head=n_head, block_b=G)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // G, S // SB),
            in_specs=[
                pl.BlockSpec((G, SB, D), lambda b, s, f: (b, s, 0)),
                pl.BlockSpec((G, T, D), lambda b, s, f: (b, 0, 0)),
                pl.BlockSpec((G, T, D), lambda b, s, f: (b, 0, 0)),
                pl.BlockSpec((G, SB, T), lambda b, s, f: (b, s, 0)),
            ],
            out_specs=pl.BlockSpec((G, SB, D), lambda b, s, f: (b, s, 0)),
        ),
        interpret=interpret,
    )(flags, q, k, v, invalid.astype(jnp.int8))


def _fwd(q, k, v, invalid, src_invalid, n_head: int, row_block: int = 0,
         kv_block: int = 0):
    out = _pallas_forward(q, k, v, invalid, src_invalid, n_head, row_block, kv_block)
    return out, (q, k, v, invalid, src_invalid)


def _bwd(n_head: int, row_block: int, kv_block: int, res, g):
    q, k, v, invalid, src_invalid = res
    # the XLA recompute does not skip dead-src rows, but their upstream g is
    # 0 (callers zero those rows before any consumer), so grads agree
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, invalid, n_head), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


fused_attention_core.defvjp(_fwd, _bwd)
