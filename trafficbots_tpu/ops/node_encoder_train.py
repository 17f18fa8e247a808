"""Training-path fused polyline-node encoder: custom-VJP Pallas kernels.

The eval bench showed the DenseTNT node stack is the most expensive module
in the whole pipeline; under training the reference path (XLA `__call__` in
ops/node_encoder.py) pays that cost again ~2x in the BPTT backward. This
module provides the same 3-layer pre-norm self-attention stack + masked
max-pool as ONE forward kernel and ONE hand-derived backward kernel, both
VMEM-resident per polyline block, with dropout INSIDE the kernel via the
TPU PRNG (`pltpu.prng_seed`/`prng_random_bits`) so the fused path no longer
disables itself when dropout is live (round-2 VERDICT item 2; PERF.md
"levers not yet pulled").

Semantics: identical math to FusedNodeEncoder.__call__ + masked max-pool
(ref transformer.py:98-240 recipe, attention NaN guard of
ref attention.py:101-107, per-layer invalid masking, -inf pool) with
flax-style inverted dropout (keep-scale 1/(1-p)). Dropout masks are NOT
bit-identical to flax's `nn.Dropout` (different PRNG) — an equally
distributed Bernoulli stream, reproducible between forward and backward by
construction: every dropout site re-seeds the PRNG with
(seed, grid-step, site-id), so the backward regenerates the exact masks
without storing them.

Backward derivation (standard dense/LN/softmax VJPs, walked layer L-1..0;
forward intermediates are recomputed in-kernel from the block input —
flash-attention-style rematerialization):

    y = LN(x):      dx = (dy*s - mean(dy*s) - xhat*mean(dy*s*xhat)) * rstd
    y = x@w + b:    dx = dy@w^T,  dw += x^T@dy,  db += colsum(dy)
    A = softmax(S): dS = A * (dA - rowsum(dA * A))
    max-pool ties:  dg split evenly among argmax ties (JAX reduce_max VJP)

Weight grads accumulate across grid steps into revisited output blocks
(zeroed at program 0 — TPU grids iterate sequentially). Validated against
jax.grad of the XLA reference at dropout_p=0 and by fixed-seed directional
finite differences with dropout live (tests/test_node_encoder_train.py).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_LN_EPS = 1e-5

# The backward kernel's one-layer-at-a-time recompute peaks ~10 MB of live
# intermediates at blk 16 — near the default 16 MB scoped-VMEM stack limit.
# Grant headroom (v5e has 128 MB VMEM); interpret mode rejects the kwarg.
from .kernel_common import COMPILER_PARAMS as _COMPILER_PARAMS
from .kernel_common import dropout_mask

# weight tuple layout (matches FusedNodeEncoder param names)
W_NAMES = (
    "ln1_s", "ln1_b", "lnt_s", "lnt_b", "ln2_s", "ln2_b",
    "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
    "w1", "b1", "w2", "b2",
)
N_W = len(W_NAMES)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_tn(a, b):  # a^T @ b
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_nt(a, b):  # a @ b^T
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ln_fwd(x, s, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * rstd
    return xhat * s + b, xhat, rstd


def _ln_bwd(dy, xhat, rstd, s):
    """Returns (dx, d_scale, d_bias)."""
    ds = jnp.sum(dy * xhat, axis=0)
    db = jnp.sum(dy, axis=0)
    dxh = dy * s
    dx = (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
          - xhat * jnp.mean(dxh * xhat, axis=-1, keepdims=True)) * rstd
    return dx, ds, db


def _dropout_mask(shape, site: int, p: float, seed_ref):
    """Regenerable inverted-dropout mask (shared core in kernel_common):
    this module folds the grid step into the site index — site count per
    program stays far below 1024 so (step * 1024 + site) is unique."""
    return dropout_mask(shape, pl.program_id(0) * 1024 + site, p, seed_ref)


def _mask_consts(vf, same, ones):
    colv = _mm_nt(ones, vf)  # [R, R] = v[j]
    allowed = same * colv
    row_has = _mm(allowed, ones)
    nv = 1.0 - jnp.minimum(row_has, 1.0)  # [R, 1] 1.0 = NaN-guard row
    use_mask = (1.0 - allowed) * (1.0 - nv)
    return nv, use_mask


def _layer_fwd(x, x0, w, l, nv, use_mask, vf, scale, n_head, d_head,
               p, get_mask, site0, save=False):
    """One pre-norm layer forward; optionally returns backward intermediates.

    `get_mask(shape, site)` supplies the (inverted) dropout mask for each
    site — the kernels bind it to the in-kernel PRNG; tests may bind it to
    dumped masks to build an exact XLA reference."""
    (ln1_s, ln1_b, lnt_s, lnt_b, ln2_s, ln2_b,
     wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2) = w
    src2, xh1, rstd1 = _ln_fwd(x, ln1_s[l], ln1_b[l])
    tgtn, xht, rstdt = _ln_fwd(x0, lnt_s[l], lnt_b[l])
    q = _mm(src2, wq[l]) + bq[l]
    k = _mm(tgtn, wk[l]) + bk[l]
    v = _mm(tgtn, wv[l]) + bv[l]
    heads, attns, masks0 = [], [], []
    for h in range(n_head):
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = _mm_nt(q[:, sl], k[:, sl]) * scale + use_mask * _NEG
        attn = jax.nn.softmax(logits, axis=-1)
        m0 = get_mask(attn.shape, site0 + h) if p > 0 else None
        attn_do = attn * m0 if p > 0 else attn
        heads.append(_mm(attn_do, v[:, sl]))
        attns.append(attn)
        masks0.append(m0)
    cat = jnp.concatenate(heads, axis=-1)
    a = _mm(cat, wo[l]) + bo[l]
    m1 = get_mask(a.shape, site0 + n_head) if p > 0 else None
    if p > 0:
        a = a * m1
    a = a * (1.0 - nv)
    x1 = x + a
    src2b, xh2, rstd2 = _ln_fwd(x1, ln2_s[l], ln2_b[l])
    z1 = _mm(src2b, w1[l]) + b1[l]
    relu = jnp.maximum(z1, 0.0)
    m2 = get_mask(relu.shape, site0 + n_head + 1) if p > 0 else None
    fdo = relu * m2 if p > 0 else relu
    f = _mm(fdo, w2[l]) + b2[l]
    m3 = get_mask(f.shape, site0 + n_head + 2) if p > 0 else None
    if p > 0:
        f = f * m3
    x2 = x1 + f
    x_out = x2 * vf
    if not save:
        return x_out
    saved = dict(
        src2=src2, xh1=xh1, rstd1=rstd1, tgtn=tgtn, xht=xht, rstdt=rstdt,
        q=q, k=k, v=v, attns=attns, masks0=masks0, cat=cat, m1=m1,
        xh2=xh2, rstd2=rstd2, src2b=src2b, z1=z1, m2=m2, fdo=fdo, m3=m3,
    )
    return x_out, saved


def _block_consts(x_ref, v_ref, n_node, blk):
    D = x_ref.shape[-1]
    R = blk * n_node
    x = x_ref[:].reshape(R, D)
    vf = v_ref[:].reshape(R, 1)
    ones = jnp.ones((R, 1), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    same = ((row // n_node) == (col // n_node)).astype(jnp.float32)
    nv, use_mask = _mask_consts(vf, same, ones)
    return x, vf, nv, use_mask


def _fwd_kernel(flag_ref, x_ref, v_ref, *refs, n_layer, n_head, n_node, blk, p):
    (*w,) = refs[:N_W]
    seed_ref = refs[N_W]
    o_ref = refs[N_W + 1]
    D = x_ref.shape[-1]
    d_head = D // n_head
    scale = 1.0 / math.sqrt(d_head)

    # fully-padded polyline blocks (the fixed 1024 capacity vs a variable
    # real prefix) write the pool identity and skip the layer chain —
    # bit-exact: their rows are zeroed by vf every layer, pooling to _NEG
    @pl.when(flag_ref[pl.program_id(0)] == 0)
    def _skip():
        o_ref[:] = jnp.full(o_ref.shape, _NEG, jnp.float32)

    @pl.when(flag_ref[pl.program_id(0)] != 0)
    def _compute():
        x, vf, nv, use_mask = _block_consts(x_ref, v_ref, n_node, blk)

        sites = n_head + 3
        get_mask = functools.partial(_dropout_mask, p=p, seed_ref=seed_ref)
        x0 = x
        xx = x
        for l in range(n_layer):
            xx = _layer_fwd(xx, x0, w, l, nv, use_mask, vf, scale, n_head, d_head,
                            p, get_mask, site0=l * sites)

        xm = xx + (1.0 - vf) * _NEG
        rows = [
            jnp.max(xm[i * n_node : (i + 1) * n_node, :], axis=0, keepdims=True)
            for i in range(blk)
        ]
        o_ref[:] = jnp.concatenate(rows, axis=0)


def _bwd_kernel(flag_ref, x_ref, v_ref, *refs, n_layer, n_head, n_node, blk, p):
    (*w,) = refs[:N_W]
    seed_ref = refs[N_W]
    g_ref = refs[N_W + 1]
    dx_ref = refs[N_W + 2]
    dw_refs = refs[N_W + 3 :]
    assert len(dw_refs) == N_W
    (ln1_s, ln1_b, lnt_s, lnt_b, ln2_s, ln2_b,
     wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2) = w

    D = x_ref.shape[-1]
    R = blk * n_node
    d_head = D // n_head
    scale = 1.0 / math.sqrt(d_head)

    # weight-grad accumulation across grid steps (sequential on TPU);
    # the zero-init MUST run even if block 0 is skipped
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[:] = jnp.zeros_like(r[:])

    # fully-padded blocks: upstream g is 0 (the caller masks their pooled
    # rows), every dw/dx term is linear in g, so skipping contributes
    # exactly nothing — write dx = 0 and accumulate nothing
    @pl.when(flag_ref[pl.program_id(0)] == 0)
    def _skip():
        dx_ref[:] = jnp.zeros(dx_ref.shape, jnp.float32)

    @pl.when(flag_ref[pl.program_id(0)] != 0)
    def _compute():
        _bwd_block(
            x_ref, v_ref, w, seed_ref, g_ref, dx_ref, dw_refs,
            n_layer=n_layer, n_head=n_head, n_node=n_node, blk=blk, p=p,
            scale=scale, d_head=d_head, R=R, D=D,
        )


def _bwd_block(x_ref, v_ref, w, seed_ref, g_ref, dx_ref, dw_refs,
               *, n_layer, n_head, n_node, blk, p, scale, d_head, R, D):
    (ln1_s, ln1_b, lnt_s, lnt_b, ln2_s, ln2_b,
     wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2) = w
    x_in0, vf, nv, use_mask = _block_consts(x_ref, v_ref, n_node, blk)
    g_pool = g_ref[:]  # [blk, D]
    sites = n_head + 3

    # ---- recompute forward, saving ONLY the per-layer inputs ([R, D] each).
    # Each layer's full intermediate set (attention maps, dropout masks,
    # FFN activations — ~10 MB/layer at blk 16) is re-derived inside the
    # backward walk below, one layer at a time, so at most ONE layer's
    # intermediates are ever live: saving all layers at once blew the 16 MB
    # scoped-VMEM stack limit (32.6 MB requested) and the whole train step
    # failed to compile. The masks regenerate bit-identically from
    # (seed, grid-step, site) at any recomputation order.
    get_mask = functools.partial(_dropout_mask, p=p, seed_ref=seed_ref)
    x0 = x_in0
    xs_in = []
    x = x_in0
    for l in range(n_layer):
        xs_in.append(x)
        x = _layer_fwd(x, x0, w, l, nv, use_mask, vf, scale, n_head,
                       d_head, p, get_mask, site0=l * sites)

    # ---- max-pool backward (ties split evenly, JAX reduce_max VJP).
    # The argmax test MUST use a natively-broadcast max: routing the max
    # through a 0/1 matmul broadcast rounds on the MXU (TPU f32 dots go
    # through bf16 passes) and the fp equality silently never fires.
    xm = x + (1.0 - vf) * _NEG
    g_slices = []
    for i in range(blk):
        sl = xm[i * n_node : (i + 1) * n_node, :]
        mx = jnp.max(sl, axis=0, keepdims=True)  # bitwise one of sl's rows
        ismx = (sl == mx).astype(jnp.float32)
        cnt = jnp.sum(ismx, axis=0, keepdims=True)
        g_slices.append(ismx * g_pool[i : i + 1, :] / jnp.maximum(cnt, 1.0))
    g = jnp.concatenate(g_slices, axis=0)  # d xm = d x_outL

    # per-layer grad slices collected in python lists, stacked at the end
    dws = {n: [None] * n_layer for n in W_NAMES}
    dx0 = jnp.zeros((R, D), jnp.float32)

    for l in range(n_layer - 1, -1, -1):
        _, s = _layer_fwd(xs_in[l], x0, w, l, nv, use_mask, vf, scale,
                          n_head, d_head, p, get_mask, site0=l * sites,
                          save=True)
        g2 = g * vf  # x_out = x2 * vf
        # x2 = x1 + do3(f) ; f = fdo@w2 + b2
        df = g2 * s["m3"] if p > 0 else g2
        dws["w2"][l] = _mm_tn(s["fdo"], df)
        dws["b2"][l] = jnp.sum(df, axis=0)
        dfdo = _mm_nt(df, w2[l])
        drelu = dfdo * s["m2"] if p > 0 else dfdo
        dz1 = drelu * (s["z1"] > 0).astype(jnp.float32)
        dws["w1"][l] = _mm_tn(s["src2b"], dz1)
        dws["b1"][l] = jnp.sum(dz1, axis=0)
        dsrc2b = _mm_nt(dz1, w1[l])
        dx1_ln, ds2, db2_ = _ln_bwd(dsrc2b, s["xh2"], s["rstd2"], ln2_s[l])
        dws["ln2_s"][l] = ds2
        dws["ln2_b"][l] = db2_
        dx1 = g2 + dx1_ln
        # x1 = x_in + do1(a) * (1 - nv)
        da = dx1 * (1.0 - nv)
        if p > 0:
            da = da * s["m1"]
        dws["wo"][l] = _mm_tn(s["cat"], da)
        dws["bo"][l] = jnp.sum(da, axis=0)
        dcat = _mm_nt(da, wo[l])
        dq_h, dk_h, dv_h = [], [], []
        for h in range(n_head):
            sl = slice(h * d_head, (h + 1) * d_head)
            do_h = dcat[:, sl]
            attn = s["attns"][h]
            attn_do = attn * s["masks0"][h] if p > 0 else attn
            dv_h.append(_mm_tn(attn_do, do_h))
            dattn = _mm_nt(do_h, s["v"][:, sl])
            if p > 0:
                dattn = dattn * s["masks0"][h]
            dS = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
            dq_h.append(_mm(dS, s["k"][:, sl]) * scale)
            dk_h.append(_mm_tn(dS, s["q"][:, sl]) * scale)
        dq = jnp.concatenate(dq_h, axis=-1)
        dk = jnp.concatenate(dk_h, axis=-1)
        dv = jnp.concatenate(dv_h, axis=-1)
        dws["wq"][l] = _mm_tn(s["src2"], dq)
        dws["bq"][l] = jnp.sum(dq, axis=0)
        dws["wk"][l] = _mm_tn(s["tgtn"], dk)
        dws["bk"][l] = jnp.sum(dk, axis=0)
        dws["wv"][l] = _mm_tn(s["tgtn"], dv)
        dws["bv"][l] = jnp.sum(dv, axis=0)
        dsrc2 = _mm_nt(dq, wq[l])
        dtgtn = _mm_nt(dk, wk[l]) + _mm_nt(dv, wv[l])
        dx_ln, ds1, db1_ = _ln_bwd(dsrc2, s["xh1"], s["rstd1"], ln1_s[l])
        dws["ln1_s"][l] = ds1
        dws["ln1_b"][l] = db1_
        dx0_ln, dst, dbt = _ln_bwd(dtgtn, s["xht"], s["rstdt"], lnt_s[l])
        dws["lnt_s"][l] = dst
        dws["lnt_b"][l] = dbt
        dx0 = dx0 + dx0_ln
        # layer input feeds both the residual (dx1) and LN1 (dx_ln)
        g = dx1 + dx_ln

    dx = g + dx0  # layer-0 input IS x0
    dx_ref[:] = dx.reshape(blk, n_node, D)

    for name, r in zip(W_NAMES, dw_refs):
        r[:] += jnp.stack(dws[name])


def _whole(shape):
    nd = len(shape)
    # index_map tolerates any grid arity + trailing scalar-prefetch refs
    return pl.BlockSpec(shape, lambda *a, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM)


def dump_dropout_masks(BP, N, D, F, n_layer, n_head, blk, p, seed,
                       interpret=False):
    """Regenerate the exact per-site dropout masks the train kernels draw
    (same (seed, grid-step, site) seeding). Test support: lets an XLA
    reference apply identical masks so the backward can be verified with
    dropout live. Returns (attn [G,L,H,R,R], m1 [G,L,R,D], m2 [G,L,R,F],
    m3 [G,L,R,D]) with G = BP//blk grid steps."""
    R = blk * N
    sites = n_head + 3
    grid = BP // blk

    def kernel(seed_ref, attn_ref, m1_ref, m2_ref, m3_ref):
        for l in range(n_layer):
            for h in range(n_head):
                attn_ref[0, l, h] = _dropout_mask((R, R), l * sites + h, p, seed_ref)
            m1_ref[0, l] = _dropout_mask((R, D), l * sites + n_head, p, seed_ref)
            m2_ref[0, l] = _dropout_mask((R, F), l * sites + n_head + 1, p, seed_ref)
            m3_ref[0, l] = _dropout_mask((R, D), l * sites + n_head + 2, p, seed_ref)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((grid, n_layer, n_head, R, R), jnp.float32),
            jax.ShapeDtypeStruct((grid, n_layer, R, D), jnp.float32),
            jax.ShapeDtypeStruct((grid, n_layer, R, F), jnp.float32),
            jax.ShapeDtypeStruct((grid, n_layer, R, D), jnp.float32),
        ),
        in_specs=[pl.BlockSpec((1,), lambda b: (0,), memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((1, n_layer, n_head, R, R), lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_layer, R, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_layer, R, F), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_layer, R, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32))


def reference_forward_with_masks(x, valid_f, weights, masks, n_layer, n_head, blk):
    """Pure-jnp forward identical to the kernels' math, with dropout masks
    supplied from dump_dropout_masks — the exact-mask oracle for testing
    the backward with dropout live. x [BP, N, D], valid_f [BP, N, 1]."""
    BP, N, D = x.shape
    R = blk * N
    d_head = D // n_head
    scale = 1.0 / math.sqrt(d_head)
    attn_m, m1_m, m2_m, m3_m = masks
    sites = n_head + 3
    ones = jnp.ones((R, 1), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    same = ((row // N) == (col // N)).astype(jnp.float32)

    pooled_blocks = []
    for b in range(BP // blk):
        xb = x[b * blk : (b + 1) * blk].reshape(R, D)
        vf = valid_f[b * blk : (b + 1) * blk].reshape(R, 1)
        nv, use_mask = _mask_consts(vf, same, ones)

        def get_mask(shape, site, _b=b):
            l, rem = divmod(site, sites)
            if rem < n_head:
                return attn_m[_b, l, rem]
            if rem == n_head:
                return m1_m[_b, l]
            if rem == n_head + 1:
                return m2_m[_b, l]
            return m3_m[_b, l]

        xc = xb
        for l in range(n_layer):
            xc = _layer_fwd(xc, xb, weights, l, nv, use_mask, vf, scale,
                            n_head, d_head, 1.0, get_mask, site0=l * sites)
        xm = xc + (1.0 - vf) * _NEG
        pooled_blocks.append(
            jnp.concatenate(
                [jnp.max(xm[i * N : (i + 1) * N, :], axis=0, keepdims=True)
                 for i in range(blk)], axis=0)
        )
    return jnp.concatenate(pooled_blocks, axis=0)


def _block_flags(valid_f, grid):
    """int32 [grid] any-valid-node flag per kernel block (all-live under
    TB_PAD_SKIP=0 — see kernel_common.PAD_SKIP_ENABLED)."""
    from .kernel_common import PAD_SKIP_ENABLED

    if not PAD_SKIP_ENABLED:
        return jnp.ones((grid,), jnp.int32)
    return (jnp.max(valid_f.reshape(grid, -1), axis=-1) > 0).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def node_encoder_train_pooled(
    x: jnp.ndarray,        # [BP, N, D] fp32
    valid_f: jnp.ndarray,  # [BP, N, 1] fp32 (1.0 = valid node)
    weights: Tuple[jnp.ndarray, ...],  # W_NAMES order
    seed: jnp.ndarray,     # int32 scalar (may be traced — flax dropout rng)
    n_layer: int, n_head: int, blk: int, dropout_p: float, interpret: bool,
    skip_invalid: bool = True,
) -> jnp.ndarray:
    """[BP, N, D] -> pooled [BP, D]; the differentiable fused node stack.

    `skip_invalid`: fully-padded polyline blocks skip the layer chain in
    BOTH directions (their pooled rows are masked by the caller and every
    grad term is linear in that zero cotangent — see _bwd_kernel)."""
    return _call_fwd(x, valid_f, weights, seed, n_layer, n_head, blk,
                     dropout_p, interpret, skip_invalid)


def _call_fwd(x, valid_f, weights, seed, n_layer, n_head, blk, p, interpret,
              skip_invalid=True):
    BP, N, D = x.shape
    assert BP % blk == 0
    grid = BP // blk
    kernel = functools.partial(
        _fwd_kernel, n_layer=n_layer, n_head=n_head, n_node=N, blk=blk, p=p
    )
    seed_arr = jnp.asarray([seed], jnp.int32)
    flags = _block_flags(valid_f, grid) if skip_invalid else jnp.ones((grid,), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BP, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((blk, N, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((blk, N, 1), lambda b, f: (b, 0, 0)),
            ] + [_whole(w.shape) for w in weights] + [
                pl.BlockSpec((1,), lambda b, f: (0,), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((blk, D), lambda b, f: (b, 0)),
        ),
        interpret=interpret,
        **_COMPILER_PARAMS,
    )(flags, x, valid_f, *weights, seed_arr)


def _vjp_fwd(x, valid_f, weights, seed, n_layer, n_head, blk, p, interpret,
             skip_invalid=True):
    out = _call_fwd(x, valid_f, weights, seed, n_layer, n_head, blk, p,
                    interpret, skip_invalid)
    return out, (x, valid_f, weights, seed)


def _vjp_bwd(n_layer, n_head, blk, p, interpret, skip_invalid, res, g):
    x, valid_f, weights, seed = res
    BP, N, D = x.shape
    grid = BP // blk
    kernel = functools.partial(
        _bwd_kernel, n_layer=n_layer, n_head=n_head, n_node=N, blk=blk, p=p
    )
    seed_arr = jnp.asarray([seed], jnp.int32)
    flags = _block_flags(valid_f, grid) if skip_invalid else jnp.ones((grid,), jnp.int32)
    out_shapes = (
        jax.ShapeDtypeStruct((BP, N, D), jnp.float32),
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
    )
    out_specs = (
        pl.BlockSpec((blk, N, D), lambda b, f: (b, 0, 0)),
        *[_whole(w.shape) for w in weights],
    )
    dx, *dws = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((blk, N, D), lambda b, f: (b, 0, 0)),
                pl.BlockSpec((blk, N, 1), lambda b, f: (b, 0, 0)),
            ] + [_whole(w.shape) for w in weights] + [
                pl.BlockSpec((1,), lambda b, f: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((blk, D), lambda b, f: (b, 0)),
            ],
            out_specs=out_specs,
        ),
        interpret=interpret,
        **_COMPILER_PARAMS,
    )(flags, x, valid_f, *weights, seed_arr, g.astype(jnp.float32))
    return dx, None, tuple(dws), None


node_encoder_train_pooled.defvjp(_vjp_fwd, _vjp_bwd)
