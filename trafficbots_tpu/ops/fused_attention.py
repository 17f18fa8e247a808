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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention_core(q, k, v, invalid, src_invalid, n_head: int, row_block: int = -1):
    """Masked MHA core: (q [B,S,D], k [B,T,D], v [B,T,D], invalid [B,S,T])
    -> [B,S,D]. `invalid` True = disallowed target (padding and/or attn
    mask already combined). `src_invalid` [B,S] (optional) marks dead QUERY
    rows (padding agent/polyline slots): blocks of them skip compute and
    output 0 — callers zero those rows downstream regardless (ref
    transformer.py:236-239), and their upstream grads are 0, so both values
    and gradients match the unskipped computation where they are consumed.
    `row_block`: query rows per grid step. -1 (DEFAULT) = round-2 whole-S
    blocking with the dead-row skip OFF — the round-4 hardware A/B winner
    at WOMD-like fill (PERF.md fill-sensitivity table: 383.9 ms vs 538.7
    skip-on at 768/40); 0 = auto ~8 skip-granular blocks with the skip ON
    (wins only on very sparse batches); >0 = explicit block size, skip ON.
    (A flash K/V-block variant existed through round 3; it lost the
    hardware A/B at every measured fill and its running-softmax
    recombination is not bit-stable under the 91-step closed loop, so it
    was removed — see PERF.md round 4.)"""
    return _pallas_forward(q, k, v, invalid, src_invalid, n_head, row_block)


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


def _pallas_forward(q, k, v, invalid, src_invalid, n_head: int, row_block: int = -1):
    B, S, D = q.shape
    T = k.shape[1]
    interpret = jax.default_backend() != "tpu"
    if _ROW_BLOCK_OVERRIDE is not None:  # measurement escape hatch (trace-time)
        row_block = _ROW_BLOCK_OVERRIDE
    # VMEM budget per grid step (~16 MB scoped limit, leave headroom):
    # q+out (fp32-ish), k+v per scene, inv int8 + 2x fp32 scores per row
    kv_bytes = 2 * T * D * k.dtype.itemsize

    def fits_g(g, sb):
        return g * (sb * D * 8 + kv_bytes + sb * T * 9) < 12 * 2**20

    skip_off = row_block < 0  # the default: round-2 blocking, no skip flags
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


def _fwd(q, k, v, invalid, src_invalid, n_head: int, row_block: int = -1):
    out = _pallas_forward(q, k, v, invalid, src_invalid, n_head, row_block)
    return out, (q, k, v, invalid, src_invalid)


def _bwd(n_head: int, row_block: int, res, g):
    q, k, v, invalid, src_invalid = res
    # the XLA recompute does not skip dead-src rows, but their upstream g is
    # 0 (callers zero those rows before any consumer), so grads agree
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, invalid, n_head), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


fused_attention_core.defvjp(_fwd, _bwd)
