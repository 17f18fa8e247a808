"""Fused DenseTNT polyline-node encoder: 3 self-attention layers + masked
max-pool over nodes in ONE Pallas kernel.

Why: profiling the full-scale eval program (batch 32) showed the map encoder
dominates the whole pipeline (~90 of ~180 ms) and its time is layout copies,
reduce_max passes and 131k tiny [20, 20] batched matmuls — not FLOPs (bf16 ==
fp32). This module keeps a block of polylines resident in VMEM across all
layers and the pool, eliminating every intermediate HBM round-trip.

The attention is block-diagonal: BLK polylines are processed as one
[BLK*N, BLK*N] score matrix with a static same-polyline mask. The redundant
cross-polyline logits are ~BLK x extra MXU work on tiny matrices — far
cheaper than BLK separate [20, 20] attentions (MXU tiles are 128-wide).

Semantics are EXACTLY models/modules.TransformerBlock with norm_first=True,
d_feedforward>0, self-attention with tgt=src (separate norm_tgt), per ref
transformer.py:98-240, including the all-invalid-row NaN guard
(attention.py:101-107,144-146) and the -inf masked max-pool of
map_encoder.py. Dropout is only live in training, which uses the XLA path
(`__call__`); the kernel path (`encode_pooled`) is eval-only.

The module OWNS its parameters as stacked [n_layer, ...] tensors so both
paths read identical weights; `stack_params_from_transformer_block` converts
a TransformerBlock param tree for parity testing.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # python float: jnp constants would be captured consts in pallas
_LN_EPS = 1e-5  # torch LayerNorm eps (parity with the reference)


def _ln(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


class FusedNodeEncoder(nn.Module):
    """Stack of pre-norm self-attention layers over polyline nodes + pool."""

    d_model: int
    n_head: int
    n_layer: int
    d_feedforward: int
    dropout_p: float = 0.1
    block_pl: int = 8  # polylines per kernel program
    # bf16 matmul operands inside the kernel (fp32 accumulation, layernorm/
    # softmax stay fp32): the MXU runs bf16 at ~4x the fp32 rate and this
    # encoder is matmul-bound. Costs ~3 decimal digits on the node features;
    # quality metrics are insensitive (see PERF.md A/B).
    matmul_bf16: bool = False
    # process this many block_pl-sized sub-blocks per grid step with SHARED
    # projection/LN/FFN matmuls: the dense ops run once over the whole
    # [n_sub*blk*N, D] row block (bigger matmuls, fewer grid steps, shorter
    # total dependency chain) while the attention score phase stays chunked
    # per sub-block so the block-diagonal [R, R] score redundancy does not
    # grow. Row count does not change per-element MXU accumulation order,
    # so any n_sub is bit-identical to n_sub=1. (The earlier interleaved
    # emission that kept per-sub matmuls separate and only reordered them
    # LOST the A/B — Mosaic would not overlap the disjoint chains.)
    pipeline_blocks: int = 1
    # skip the whole 3-layer compute chain for grid steps whose polylines
    # are ALL padding (scalar-prefetched per-block any-valid flag + pl.when).
    # The map is packed to a fixed 1024-polyline capacity (ref
    # data_h5_womd.py:82) but real WOMD scenes fill a variable prefix, so
    # the tail blocks of most scenes are pure padding. Bit-exact: a fully
    # invalid block's rows are zeroed by `vf` every layer and the masked
    # max-pool then yields exactly _NEG, which is what the skip writes.
    skip_invalid_blocks: bool = True

    def setup(self):
        L, D, F = self.n_layer, self.d_model, self.d_feedforward
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        p = self.param
        self.ln1_s = p("ln1_s", ones, (L, D))
        self.ln1_b = p("ln1_b", zeros, (L, D))
        self.lnt_s = p("lnt_s", ones, (L, D))
        self.lnt_b = p("lnt_b", zeros, (L, D))
        self.ln2_s = p("ln2_s", ones, (L, D))
        self.ln2_b = p("ln2_b", zeros, (L, D))
        self.wq = p("wq", init, (L, D, D))
        self.wk = p("wk", init, (L, D, D))
        self.wv = p("wv", init, (L, D, D))
        self.wo = p("wo", init, (L, D, D))
        self.bq = p("bq", zeros, (L, D))
        self.bk = p("bk", zeros, (L, D))
        self.bv = p("bv", zeros, (L, D))
        self.bo = p("bo", zeros, (L, D))
        self.w1 = p("w1", init, (L, D, F))
        self.b1 = p("b1", zeros, (L, F))
        self.w2 = p("w2", init, (L, F, D))
        self.b2 = p("b2", zeros, (L, D))
        if self.dropout_p > 0:
            self.dropouts = [
                [nn.Dropout(self.dropout_p, name=f"do_{l}_{k}") for k in range(4)]
                for l in range(self.n_layer)
            ]
        else:
            self.dropouts = None

    # ------------------------------------------------------------------ XLA
    def __call__(
        self,
        x: jnp.ndarray,  # [BP, N, D]
        valid: jnp.ndarray,  # [BP, N]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Reference path (training/CPU): returns per-node features [BP, N, D]
        after all layers — the caller pools (matching the unfused MapEncoder
        structure)."""
        d_head = self.d_model // self.n_head
        BP, N, D = x.shape
        pad = ~valid
        no_valid = jnp.all(pad, axis=-1)  # [BP]

        def do(l, k, t):
            if self.dropouts is None:
                return t
            return self.dropouts[l][k](t, deterministic=deterministic)

        # NOTE: the TransformerBlock stack feeds the ORIGINAL input as the
        # attention target to EVERY layer (k/v fixed at layer-0 features,
        # only the query side evolves) — ref transformer.py:18-95 semantics.
        x0 = x
        for l in range(self.n_layer):
            src2 = _ln(x, self.ln1_s[l], self.ln1_b[l])
            tgtn = _ln(x0, self.lnt_s[l], self.lnt_b[l])
            q = (src2 @ self.wq[l] + self.bq[l]).reshape(BP, N, self.n_head, d_head)
            k = (tgtn @ self.wk[l] + self.bk[l]).reshape(BP, N, self.n_head, d_head)
            v = (tgtn @ self.wv[l] + self.bv[l]).reshape(BP, N, self.n_head, d_head)
            logits = jnp.einsum("bshd,bthd->bhst", q, k).astype(jnp.float32)
            use_mask = pad[:, None, :] & (~no_valid[:, None, None])
            logits = jnp.where(use_mask[:, None], -jnp.inf, logits)
            attn = jax.nn.softmax(logits / np.sqrt(d_head), axis=-1)
            attn = do(l, 0, attn)
            a = jnp.einsum("bhst,bthd->bshd", attn.astype(v.dtype), v).reshape(BP, N, D)
            a = a @ self.wo[l] + self.bo[l]
            a = jnp.where(no_valid[:, None, None], 0.0, a)
            x = x + do(l, 1, a)
            src2 = _ln(x, self.ln2_s[l], self.ln2_b[l])
            f = nn.relu(src2 @ self.w1[l] + self.b1[l])
            f = do(l, 2, f)
            f = f @ self.w2[l] + self.b2[l]
            x = x + do(l, 3, f)
            x = jnp.where(pad[..., None], 0.0, x)
        return x

    # ------------------------------------------------------------ hybrid
    def encode_pooled_hybrid(self, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """Hybrid eval path: layernorms + qkv/out projections + FFN as big
        XLA matmuls over all polylines; ONLY the tiny per-polyline attention
        (scores/softmax/AV) runs in a Pallas kernel (block-diagonal, VMEM-
        resident scores). Same numbers as __call__ + masked max-pool.

        Measured SLOWER than the monolithic kernel at full scale (290 vs
        155 ms at batch 128): every layer round-trips ~10 x 335 MB of
        intermediates through HBM, which costs more than the monolithic
        kernel's serial per-grid chain saves. Kept as a selectable
        implementation (map_encoder.node_encoder_impl) — it wins when VMEM
        is too small for the full stack (bigger d_model / d_ff).
        """
        BP, N, D = x.shape
        BLK = self.block_pl
        assert BP % BLK == 0, f"n_scene*n_pl={BP} must be a multiple of {BLK}"
        grid = BP // BLK
        interpret = jax.default_backend() != "tpu"
        pad = ~valid
        no_valid = jnp.all(pad, axis=-1)  # [BP]
        vf = valid.astype(jnp.float32)[..., None]

        kernel = functools.partial(
            _block_attn_kernel, n_head=self.n_head, n_node=N, blk=BLK,
            bf16=self.matmul_bf16,
        )

        def attn_core(q, k, v):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((BP, N, D), jnp.float32),
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((BLK, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, N, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                interpret=interpret,
            )(q, k, v, vf)

        x = x.astype(jnp.float32)
        x0 = x
        for l in range(self.n_layer):
            src2 = _ln(x, self.ln1_s[l], self.ln1_b[l])
            tgtn = _ln(x0, self.lnt_s[l], self.lnt_b[l])
            q = src2 @ self.wq[l] + self.bq[l]
            k = tgtn @ self.wk[l] + self.bk[l]
            v = tgtn @ self.wv[l] + self.bv[l]
            a = attn_core(q, k, v)
            a = a @ self.wo[l] + self.bo[l]
            a = jnp.where(no_valid[:, None, None], 0.0, a)
            x = x + a
            src2 = _ln(x, self.ln2_s[l], self.ln2_b[l])
            f = nn.relu(src2 @ self.w1[l] + self.b1[l])
            f = f @ self.w2[l] + self.b2[l]
            x = x + f
            x = jnp.where(pad[..., None], 0.0, x)

        x = jnp.where(pad[..., None], _NEG, x)
        return jnp.max(x, axis=1)

    # ------------------------------------------------- Pallas (training)
    def encode_pooled_train(self, x: jnp.ndarray, valid: jnp.ndarray,
                            seed: jnp.ndarray) -> jnp.ndarray:
        """Training eval of the fused stack: custom-VJP forward/backward
        kernels with IN-KERNEL dropout (ops/node_encoder_train.py), so the
        fused path no longer falls back to XLA when dropout is live. Same
        weights as every other path; pooled [BP, D] out."""
        from .node_encoder_train import W_NAMES, node_encoder_train_pooled

        weights = tuple(getattr(self, n).astype(jnp.float32) for n in W_NAMES)
        vf = valid.astype(jnp.float32)[..., None]
        return node_encoder_train_pooled(
            x.astype(jnp.float32), vf, weights, seed,
            self.n_layer, self.n_head, self.block_pl, float(self.dropout_p),
            jax.default_backend() != "tpu",
            self.skip_invalid_blocks,
        )

    # --------------------------------------------------------------- Pallas
    def encode_pooled(self, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """Fused eval path: [BP, N, D], [BP, N] -> pooled [BP, D] (masked max
        over valid nodes; all-invalid polylines come out at -1e30 and must be
        zeroed by the caller's pl_valid mask, same as the -inf pool)."""
        BP, N, D = x.shape
        BLK = self.block_pl
        SUB = max(1, self.pipeline_blocks)
        STEP = BLK * SUB  # polylines per grid step
        assert BLK % 8 == 0, "pooled-output block sublane dim must be divisible by 8"
        assert BP % STEP == 0, f"n_scene*n_pl={BP} must be a multiple of {STEP}"
        grid = BP // STEP

        weights = (
            self.ln1_s, self.ln1_b, self.lnt_s, self.lnt_b, self.ln2_s, self.ln2_b,
            self.wq, self.bq, self.wk, self.bk, self.wv, self.bv, self.wo, self.bo,
            self.w1, self.b1, self.w2, self.b2,
        )
        kernel = functools.partial(
            _node_kernel, n_layer=self.n_layer, n_head=self.n_head, n_node=N, blk=BLK,
            bf16=self.matmul_bf16, n_sub=SUB,
        )
        w_specs = [
            pl.BlockSpec(w.shape, lambda b, f, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
            for w in weights
        ]
        from .kernel_common import COMPILER_PARAMS, PAD_SKIP_ENABLED

        if self.skip_invalid_blocks and PAD_SKIP_ENABLED:
            flags = jnp.any(valid.reshape(grid, -1), axis=-1).astype(jnp.int32)
        else:
            flags = jnp.ones((grid,), jnp.int32)
        interpret = jax.default_backend() != "tpu"
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BP, D), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((STEP, N, D), lambda b, f: (b, 0, 0)),
                    pl.BlockSpec((STEP, N, 1), lambda b, f: (b, 0, 0)),
                ] + w_specs,
                out_specs=pl.BlockSpec((STEP, D), lambda b, f: (b, 0)),
            ),
            interpret=interpret,
            # n_sub > 1 widens the live working set past the default 16 MB
            # scoped-VMEM stack limit (v5e has 128 MB VMEM); interpret mode
            # rejects the kwarg
            **({} if interpret else COMPILER_PARAMS),
        )(
            flags,
            x.astype(jnp.float32),
            valid.astype(jnp.float32)[..., None],
            *[w.astype(jnp.float32) for w in weights],
        )


def _block_attn_kernel(
    q_ref, k_ref, v_ref, vf_ref, o_ref, *, n_head: int, n_node: int, blk: int, bf16: bool
):
    """Score+softmax+AV core only, block-diagonal over `blk` polylines.

    The hybrid node-encoder path (encode_pooled_hybrid) runs the layernorms,
    qkv/out projections and FFN as big XLA matmuls over all 131k polylines
    (MXU-perfect, fused elementwise) and calls this kernel just for the part
    XLA does badly: 131k tiny [20, 20] attentions. Returns the concatenated
    per-head mix BEFORE the output projection; rows whose polyline has no
    valid node come out finite (mask lifted) and are zeroed by the caller
    after the out-projection, exactly like models/modules.Attention.
    """
    D = q_ref.shape[-1]
    R = blk * n_node
    d_head = D // n_head
    scale = 1.0 / math.sqrt(d_head)
    mm_t = jnp.bfloat16 if bf16 else jnp.float32

    q = q_ref[:].reshape(R, D)
    k = k_ref[:].reshape(R, D)
    v = v_ref[:].reshape(R, D)
    vf = vf_ref[:].reshape(R, 1)
    ones = jnp.ones((R, 1), jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    same = ((row // n_node) == (col // n_node)).astype(jnp.float32)
    colv = jax.lax.dot_general(
        ones, vf, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    allowed = same * colv
    row_has = jax.lax.dot_general(
        allowed, ones, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    nv = 1.0 - jnp.minimum(row_has, 1.0)
    use_mask = (1.0 - allowed) * (1.0 - nv)

    heads = []
    for h in range(n_head):
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = jax.lax.dot_general(
            q[:, sl].astype(mm_t), k[:, sl].astype(mm_t),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale + use_mask * _NEG
        attn = jax.nn.softmax(logits, axis=-1)
        heads.append(
            jnp.dot(attn.astype(mm_t), v[:, sl].astype(mm_t),
                    preferred_element_type=jnp.float32)
        )
    o = jnp.concatenate(heads, axis=-1)
    o_ref[:] = o.reshape(blk, n_node, D)


def _node_kernel(
    flag_ref,
    x_ref, v_ref,
    ln1_s, ln1_b, lnt_s, lnt_b, ln2_s, ln2_b,
    wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2,
    o_ref,
    *, n_layer: int, n_head: int, n_node: int, blk: int, bf16: bool = False,
    n_sub: int = 1,
):
    """`n_sub` > 1 widens one grid step to n_sub blk-sized sub-blocks whose
    layernorms, q/k/v/out projections and FFN run as SINGLE matmuls over the
    concatenated [n_sub*blk*n_node, D] rows — 4x fewer grid steps and 4x
    bigger dense ops attack the serial per-grid dependency chain this kernel
    is bound by — while the score/softmax/AV phase stays chunked per
    sub-block so the block-diagonal score redundancy does not grow.

    `flag_ref` is a scalar-prefetched [grid] any-valid flag: grid steps whose
    polylines are all padding write the pool identity (_NEG, bit-exact with
    the computed result for all-invalid blocks) and skip the layer chain."""

    @pl.when(flag_ref[pl.program_id(0)] == 0)
    def _skip():
        o_ref[:] = jnp.full(o_ref.shape, _NEG, jnp.float32)

    @pl.when(flag_ref[pl.program_id(0)] != 0)
    def _compute():
        _node_kernel_body(
            x_ref, v_ref,
            ln1_s, ln1_b, lnt_s, lnt_b, ln2_s, ln2_b,
            wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2,
            o_ref,
            n_layer=n_layer, n_head=n_head, n_node=n_node, blk=blk,
            bf16=bf16, n_sub=n_sub,
        )


def _node_kernel_body(
    x_ref, v_ref,
    ln1_s, ln1_b, lnt_s, lnt_b, ln2_s, ln2_b,
    wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2,
    o_ref,
    *, n_layer: int, n_head: int, n_node: int, blk: int, bf16: bool,
    n_sub: int,
):
    D = x_ref.shape[-1]
    R = blk * n_node
    d_head = D // n_head
    scale = 1.0 / math.sqrt(d_head)
    mm_t = jnp.bfloat16 if bf16 else jnp.float32

    def mm(a, b):
        return jnp.dot(a.astype(mm_t), b.astype(mm_t), preferred_element_type=jnp.float32)

    R_all = n_sub * R
    ones = jnp.ones((R, 1), jnp.float32)
    # static block-diagonal (same-polyline) mask, shared by all sub-blocks
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    same = ((row // n_node) == (col // n_node)).astype(jnp.float32)

    x = x_ref[:].reshape(R_all, D)
    vf = v_ref[:].reshape(R_all, 1)  # 1.0 = valid node
    nvs, masks = [], []
    for s in range(n_sub):
        vf_s = vf[s * R : (s + 1) * R]
        # column validity via outer product (avoids transposes/relayouts)
        colv = jax.lax.dot_general(
            ones, vf_s, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, R] = v[j]
        allowed = same * colv
        row_has = jax.lax.dot_general(
            allowed, ones, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, 1] count of attendable targets
        nv = 1.0 - jnp.minimum(row_has, 1.0)  # [R, 1] 1.0 = NaN-guard row
        nvs.append(nv)
        masks.append((1.0 - allowed) * (1.0 - nv))  # lifted for guard rows
    nv_all = nvs[0] if n_sub == 1 else jnp.concatenate(nvs, axis=0)

    x0 = x  # k/v target fixed at layer-0 features (TransformerBlock)
    for l in range(n_layer):
        src2 = _ln(x, ln1_s[l], ln1_b[l])
        tgtn = _ln(x0, lnt_s[l], lnt_b[l])
        q = mm(src2, wq[l]) + bq[l]
        k = mm(tgtn, wk[l]) + bk[l]
        v = mm(tgtn, wv[l]) + bv[l]
        atts = []
        for s in range(n_sub):
            rows = slice(s * R, (s + 1) * R)
            heads = []
            for h in range(n_head):
                sl = slice(h * d_head, (h + 1) * d_head)
                logits = jax.lax.dot_general(
                    q[rows, sl].astype(mm_t), k[rows, sl].astype(mm_t),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                logits = logits * scale + masks[s] * _NEG
                attn = jax.nn.softmax(logits, axis=-1)
                heads.append(mm(attn, v[rows, sl]))
            atts.append(jnp.concatenate(heads, axis=-1))
        a = atts[0] if n_sub == 1 else jnp.concatenate(atts, axis=0)
        a = mm(a, wo[l]) + bo[l]
        a = a * (1.0 - nv_all)
        x = x + a
        src2 = _ln(x, ln2_s[l], ln2_b[l])
        f = jnp.maximum(mm(src2, w1[l]) + b1[l], 0.0)
        f = mm(f, w2[l]) + b2[l]
        x = x + f
        x = x * vf  # zero invalid rows (per-layer masking of the reference)

    # masked max-pool over each polyline's nodes
    x = x + (1.0 - vf) * _NEG
    o_ref[:] = jnp.concatenate(
        [
            jnp.max(x[i * n_node : (i + 1) * n_node, :], axis=0, keepdims=True)
            for i in range(blk * n_sub)
        ],
        axis=0,
    )


def stack_params_from_transformer_block(tb_params: dict, n_layer: int) -> dict:
    """Convert a models/modules.TransformerBlock param tree (self-attention,
    norm_first, d_ff>0) to FusedNodeEncoder stacked params — parity testing."""
    out = {}

    def lyr(i):
        return tb_params[f"layer{i}"]

    out["ln1_s"] = jnp.stack([lyr(i)["norm1"]["scale"] for i in range(n_layer)])
    out["ln1_b"] = jnp.stack([lyr(i)["norm1"]["bias"] for i in range(n_layer)])
    out["lnt_s"] = jnp.stack([lyr(i)["norm_tgt"]["scale"] for i in range(n_layer)])
    out["lnt_b"] = jnp.stack([lyr(i)["norm_tgt"]["bias"] for i in range(n_layer)])
    out["ln2_s"] = jnp.stack([lyr(i)["norm2"]["scale"] for i in range(n_layer)])
    out["ln2_b"] = jnp.stack([lyr(i)["norm2"]["bias"] for i in range(n_layer)])
    for name, src in (("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"), ("wo", "out_proj")):
        out[name] = jnp.stack([lyr(i)["attn"][src]["kernel"] for i in range(n_layer)])
        out["b" + name[1]] = jnp.stack([lyr(i)["attn"][src]["bias"] for i in range(n_layer)])
    out["w1"] = jnp.stack([lyr(i)["linear1"]["kernel"] for i in range(n_layer)])
    out["b1"] = jnp.stack([lyr(i)["linear1"]["bias"] for i in range(n_layer)])
    out["w2"] = jnp.stack([lyr(i)["linear2"]["kernel"] for i in range(n_layer)])
    out["b2"] = jnp.stack([lyr(i)["linear2"]["bias"] for i in range(n_layer)])
    return out
