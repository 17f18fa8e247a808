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

_NEG_INF = float("-inf")


def _attn_kernel(q_ref, k_ref, v_ref, inv_ref, o_ref, *, n_head: int, block_b: int):
    """block_b scenes per grid step: q [G, S, D], k/v [G, T, D], inv
    [G, S, T] int8, o [G, S, D]. Batching scenes into one grid step
    amortizes the per-grid-step launch/pipeline overhead — this kernel runs
    90x per rollout inside the scan, so grid count is the cost driver.

    All mask logic is float arithmetic — boolean (i1) vectors trip Mosaic
    relayouts on non-native tile shapes. exp(x - 1e30) underflows to exactly
    0.0 in fp32, so the additive -1e30 mask equals the reference's -inf.
    """
    d_head = q_ref.shape[-1] // n_head
    scale = 1.0 / math.sqrt(d_head)

    for b in range(block_b):
        q = q_ref[b]
        k = k_ref[b]
        v = v_ref[b]
        inv = inv_ref[b].astype(jnp.float32)  # [S, T] 1.0 = masked target

        no_valid = jnp.min(inv, axis=-1, keepdims=True)  # [S, 1] 1.0 iff all masked
        use_mask = inv * (1.0 - no_valid)  # NaN guard: lift mask on dead rows

        outs = []
        for h in range(n_head):
            sl = slice(h * d_head, (h + 1) * d_head)
            logits = jax.lax.dot_general(
                q[:, sl], k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, T]
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention_core(q, k, v, invalid, n_head: int):
    """Masked MHA core: (q [B,S,D], k [B,T,D], v [B,T,D], invalid [B,S,T])
    -> [B,S,D]. `invalid` True = disallowed target (padding and/or attn
    mask already combined)."""
    return _pallas_forward(q, k, v, invalid, n_head)


def _pallas_forward(q, k, v, invalid, n_head: int):
    B, S, D = q.shape
    T = k.shape[1]
    interpret = jax.default_backend() != "tpu"
    # scenes per grid step: bounded by VMEM (q/k/v + fp32 scores + out per
    # scene; ~16 MB scoped limit) and must divide the batch; beyond that,
    # measured neutral vs G=1 at full scale (the kernel is K/V-stream bound,
    # not launch bound) — kept for fewer grid launches
    kv_bytes = 2 * T * D * k.dtype.itemsize
    per_scene = S * D * 8 + kv_bytes + S * T * 9  # q+out, k+v, inv + 2x scores
    G = next((g for g in (4, 2, 1) if B % g == 0 and g * per_scene < 12 * 2**20), None)
    if G is None:
        # one scene's working set exceeds scoped VMEM (large-S episode
        # attentions, e.g. the latent as2pl at S=1216 x T=1024): block the
        # query dimension instead — k/v stay whole per scene, each grid step
        # handles an SB-row slice of queries (row-local mask semantics, so
        # the NaN guard still works per block)
        def fits(sb):
            return sb * D * 8 + kv_bytes + sb * T * 9 < 12 * 2**20

        SB = next((sb for sb in range(S // 2, 31, -1) if S % sb == 0 and fits(sb)), None)
        if SB is None:
            return _xla_reference(q, k, v, invalid, n_head)
        kernel = functools.partial(_attn_kernel, n_head=n_head, block_b=1)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
            grid=(B, S // SB),
            in_specs=[
                pl.BlockSpec((1, SB, D), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SB, T), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, SB, D), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(q, k, v, invalid.astype(jnp.int8))
    kernel = functools.partial(_attn_kernel, n_head=n_head, block_b=G)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        q, k, v, invalid.astype(jnp.int8)
    )


def _fwd(q, k, v, invalid, n_head: int):
    return _pallas_forward(q, k, v, invalid, n_head), (q, k, v, invalid)


def _bwd(n_head: int, res, g):
    q, k, v, invalid = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, invalid, n_head), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention_core.defvjp(_fwd, _bwd)
