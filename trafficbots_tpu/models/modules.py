"""Core neural-net building blocks (flax.linen), masked for padded entities.

TPU-native re-implementations of /root/reference/src/models/modules/*.py:
  - MLP               ref mlp.py:20-85 (masking before the end-layer activation
                      is a load-bearing quirk: invalid rows become act(fill))
  - Attention         ref attention.py:9-154 (incl. the all-invalid-target
                      softmax NaN guard, reproduced branchlessly)
  - TransformerBlock  ref transformer.py:18-240 (pre/post-norm, DenseTNT
                      activation-residual variant when d_feedforward <= 0)
  - InputPeEncoder    ref input_pe_encoder.py:8-61
  - TemporalAggregate ref agent_temporal.py:7-39
  - StackedGRU        ref agent_temporal.py:50-193 (GRU over agents; hidden
                      masked to zero for invalid agents each step)
  - MultiAgentTF      ref agent_interaction.py:9-107 (the reference's Python
                      branch slicing out single-valid-agent batches becomes a
                      branchless per-batch select)
  - AddLatentGoal     ref add_latent_goal.py:9-77
  - ActionHead        ref action_head.py:9-98

All attention/matmul computations accept a `compute_dtype` (bf16 on TPU by
default for encoders); parameters stay fp32.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


def _activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "elu": nn.elu,
        "leaky_relu": nn.leaky_relu,
    }[name]


class _PairDense(nn.Module):
    """First MLP layer over an IMPLICIT concat of two broadcast factors.

    `Dense(concat([broadcast(src), broadcast(tgt)], -1))` factors exactly into
    `src @ kernel[:d_src] + tgt @ kernel[d_src:] + bias` with the matmuls on
    the UN-broadcast factors — the pair tensor only materializes at the
    (cheap) broadcast-add. For the dest-predictor head this removes the
    [S, A, P, 2d] concat (~2 GB at train scale) and shrinks the first-layer
    matmul FLOPs by the broadcast factor in both directions of autodiff.
    Param tree is identical to `nn.Dense` (kernel [d_src+d_tgt, features],
    bias [features]), so checkpoints and parity-test weight transfer are
    unaffected.
    """

    features: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
        d_src, d_tgt = src.shape[-1], tgt.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d_src + d_tgt, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.compute_dtype)
        a = src.astype(self.compute_dtype) @ kernel[:d_src]
        b = tgt.astype(self.compute_dtype) @ kernel[d_src:]
        return a + b + bias.astype(self.compute_dtype)


class _TailPaddedDense(nn.Module):
    """`nn.Dense(features)` whose OUTPUT is zero-padded to `pad_to` channels
    at matmul time: x @ pad(kernel) + pad(bias). The stored parameters keep
    the exact `nn.Dense` shapes/names (kernel [in, features], bias
    [features]) so checkpoints and parity weight-transfer are unaffected, and
    columns `features..pad_to` of the output are exact zeros (dot with a zero
    column). Wider N on the MXU is free up to the 128-lane tile the narrow
    output would pad to anyway; what it buys is that the [..., pad_to] result
    can absorb a tail tensor with a fused add instead of a `concatenate` —
    see InputPeEncoder (cat mode), where this removed two ~3 GB padded temps
    per 256-scene episode encode.
    """

    features: int
    pad_to: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.pad_to - self.features
        kernel = jnp.pad(kernel.astype(self.compute_dtype), ((0, 0), (0, pad)))
        bias = jnp.pad(bias.astype(self.compute_dtype), ((0, pad),))
        return x.astype(self.compute_dtype) @ kernel + bias


class MLP(nn.Module):
    """Linear stack with optional layernorm/dropout.

    Matches the reference forward semantics (mlp.py:72-85): the valid mask is
    applied to the *pre-activation* output of the last layer, then the
    end-layer activation runs on the masked tensor — so invalid rows hold
    act(fill_invalid), not 0.

    `x` may be a tuple `(src, tgt)` of broadcast-compatible arrays standing
    for `concat([broadcast(src), broadcast(tgt)], -1)`: the first layer then
    runs factored (`_PairDense`, same "fc0" param tree) so the concat never
    materializes. Semantically identical up to fp32 summation order.

    `pad_last_to > 0` zero-pads the LAST layer's output to that many channels
    at matmul time (`_TailPaddedDense`, same "fc{i}" param tree) so a caller
    can add a tail feature in place of concatenating one. Only legal when
    nothing post-processes the padded channels (no end activation / masking).
    """

    fc_dims: Sequence[int]  # output dims of each layer (input dim inferred)
    dropout_p: Optional[float] = 0.1
    use_layernorm: bool = False
    activation: str = "relu"
    end_layer_activation: bool = True
    compute_dtype: Dtype = jnp.float32  # params stay fp32 (flax dtype semantics)
    pad_last_to: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
        fill_invalid: float = 0.0,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        act = _activation(self.activation)
        n = len(self.fc_dims)
        if self.pad_last_to:
            # padded channels must stay exact zeros for the caller's tail-add
            assert not self.end_layer_activation and valid is None
            assert self.pad_last_to >= self.fc_dims[-1]
        if isinstance(x, tuple):
            src, tgt = x
            in_dtype = src.dtype
            x = _PairDense(self.fc_dims[0], compute_dtype=self.compute_dtype, name="fc0")(
                src, tgt
            )
            first_done = True
        else:
            in_dtype = x.dtype
            first_done = False
        for i, dim in enumerate(self.fc_dims):
            is_padded_last = self.pad_last_to and i == n - 1 and not (first_done and i == 0)
            if is_padded_last:
                x = _TailPaddedDense(
                    features=dim, pad_to=self.pad_last_to,
                    compute_dtype=self.compute_dtype, name=f"fc{i}",
                )(x)
            elif not (first_done and i == 0):
                x = nn.Dense(dim, name=f"fc{i}", dtype=self.compute_dtype)(x)
            is_last = i == n - 1
            if not is_last or self.end_layer_activation:
                if self.use_layernorm:
                    x = nn.LayerNorm(epsilon=1e-5, name=f"ln{i}")(x)
                if self.dropout_p is not None and self.dropout_p > 0:
                    x = nn.Dropout(self.dropout_p, name=f"do{i}")(x, deterministic=deterministic)
            if not is_last:
                x = act(x)
        if valid is not None:
            x = jnp.where(valid[..., None], x, jnp.asarray(fill_invalid, x.dtype))
        if self.end_layer_activation:
            x = act(x)
        return x.astype(in_dtype)


class Attention(nn.Module):
    """Multi-head attention with padded-target masking and NaN guard.

    Ref attention.py:53-154. Rows whose targets are ALL masked would softmax
    to NaN; the reference un-masks those rows then zeroes their output
    (attention.py:101-107,144-146). Here this is branchless: the mask is
    lifted where `no_valid_tgt`, and outputs are zeroed by the same flag.
    """

    d_model: int
    n_head: int
    dropout_p: float = 0.0
    bias: bool = True
    compute_dtype: Dtype = jnp.float32
    # use the Pallas fused core when eligible (TPU only). The kernel keeps
    # the [S, T] scores VMEM-resident, which wins when the XLA alternative
    # materializes large logits (as2pl: T=1024, logits grow linearly with
    # batch — fused 1.57M vs XLA 1.32M agent-steps/s at batch 128). For
    # small-T in-scan blocks the launch overhead dominates instead — those
    # call sites pass allow_fused=False via fused_attention_small_t.
    fused: bool = True
    # training: custom-VJP kernel pair with in-kernel attention-weight
    # dropout (ops/attention_train.py) for large-T attention — the eval
    # core's VJP re-runs the XLA reference in backward, re-materializing
    # the [B, H, S, T] logits in HBM on every BPTT step
    fused_train: bool = True

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, S, d]
        tgt: Optional[jnp.ndarray] = None,  # [B, T, d]; None = self-attention
        tgt_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = invalid
        attn_mask: Optional[jnp.ndarray] = None,  # [B, S, T] True = disabled
        need_weights: bool = False,
        deterministic: bool = True,
        tgt_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # cached (k, v)
        return_kv: bool = False,
        allow_fused: bool = True,
        src_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = dead query row
        row_block: int = -1,  # fused-kernel query rows/grid step (-1 = whole-S
        # blocks, dead-row skip OFF — the round-4 A/B winner at realistic
        # fill; 0 = auto skip-granular blocks, skip ON; see config.py
        # attn_row_block)
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """`tgt_kv` short-circuits the K/V projections with precomputed values
        — the rollout hot-loop optimization for step-invariant targets (the
        map tokens): K/V of 1024 polylines are projected once per episode
        instead of once per step per layer. `return_kv=True` runs only the
        K/V projections and returns (k, v) [B, T, d_model] for that cache.
        """
        d_head = self.d_model // self.n_head
        assert d_head * self.n_head == self.d_model

        dense = lambda name: nn.Dense(self.d_model, use_bias=self.bias, name=name, dtype=self.compute_dtype)
        if return_kv:
            kv_in = src if tgt is None else tgt
            return dense("k_proj")(kv_in), dense("v_proj")(kv_in)
        q = dense("q_proj")(src)
        if tgt_kv is not None:
            k, v = tgt_kv
        else:
            kv_in = src if tgt is None else tgt
            k = dense("k_proj")(kv_in)
            v = dense("v_proj")(kv_in)

        if k.ndim == 4:
            # per-src KNN targets: tgt [B, S, T, d], mask [B, S, T]
            # (ref attention.py:117-124,135-138)
            return self._knn_attention(
                q, k, v, tgt_padding_mask, attn_mask, need_weights, deterministic
            )

        B, S = src.shape[:2]
        T = k.shape[1]

        invalid = None  # [B, S, T]
        if tgt_padding_mask is not None:
            invalid = jnp.broadcast_to(tgt_padding_mask[:, None, :], (B, S, T))
        if attn_mask is not None:
            am = jnp.broadcast_to(attn_mask, (B, S, T))
            invalid = am if invalid is None else (invalid | am)
        no_valid_tgt = None if invalid is None else jnp.all(invalid, axis=-1)  # [B, S]

        # Fused Pallas path: one kernel for mask+softmax+matmuls, keeping the
        # [S, T] scores in VMEM (the rollout hot loop is bound by kernel count
        # and logits HBM traffic). Inactive when attention-weight dropout is
        # live or the (viz-only) weights are requested. Callers outside the
        # rollout scan (latent encoder, map polyline self-attn) pass
        # allow_fused=False: measured neutral vs XLA at their large-batch
        # shapes, so they stay on the simpler XLA path.
        use_fused = (
            self.fused
            and allow_fused
            and not need_weights
            and (deterministic or self.dropout_p <= 0)
            and jax.default_backend() == "tpu"
            # only worthwhile at hot-loop sizes (agents x map/tl/agents);
            # small episode-level attentions (e.g. 20x20 polyline nodes) stay
            # on the XLA path
            and S >= 32
            and T >= 64
        )
        # training path with a REAL backward kernel (+ in-kernel dropout):
        # large-T only — XLA's bwd is fine for the small-T in-scan blocks,
        # and the win here is avoiding [B, H, S, 1024] logits round-tripping
        # HBM in the BPTT backward (PERF.md round-3 scan decomposition)
        use_fused_train = (
            self.fused
            and self.fused_train
            and allow_fused
            and not need_weights
            and not deterministic
            and jax.default_backend() == "tpu"
            and S >= 32
            and T >= 256
        )
        if use_fused_train:
            from ..ops.attention_train import (
                fused_attention_train, fused_attention_train_fits,
            )

            use_fused_train = fused_attention_train_fits(B, S, T, self.d_model)
        if use_fused_train:
            inv = invalid if invalid is not None else jnp.zeros((B, S, T), bool)
            if self.dropout_p > 0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
            else:
                seed = jnp.zeros((), jnp.int32)
            out = fused_attention_train(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), inv, seed,
                self.n_head, float(self.dropout_p), src_padding_mask,
            )
            attn = None
        elif use_fused:
            from ..ops.fused_attention import fused_attention_core

            inv = invalid if invalid is not None else jnp.zeros((B, S, T), bool)
            # bf16 K/V cache (map_kv_bf16): operands bf16, fp32 accumulation
            q_in = q.astype(k.dtype) if k.dtype == jnp.bfloat16 else q
            # src_padding_mask feeds the kernel's query-block skip flags only:
            # dead rows (padding agents/polylines past the real prefix) come
            # out 0 instead of the reference's garbage-then-zeroed — the
            # caller zeroes them either way (ref transformer.py:236-239)
            out = fused_attention_core(q_in, k, v, inv, src_padding_mask, self.n_head, row_block)
            attn = None
        else:
            # a bf16 K/V cache is cast up AFTER the HBM load (XLA fuses the
            # convert into the consumer, so the traffic saving is kept)
            k = k.astype(q.dtype)
            v = v.astype(q.dtype)
            q = q.reshape(B, S, self.n_head, d_head)
            kh = k.reshape(B, T, self.n_head, d_head)
            vh = v.reshape(B, T, self.n_head, d_head)

            logits = jnp.einsum("bshd,bthd->bhst", q, kh).astype(jnp.float32)
            if invalid is not None:
                use_mask = invalid & (~no_valid_tgt[..., None])
                logits = jnp.where(use_mask[:, None], -jnp.inf, logits)

            attn = jax.nn.softmax(logits / np.sqrt(d_head), axis=-1)
            if self.dropout_p > 0:
                attn = nn.Dropout(self.dropout_p, name="attn_do")(attn, deterministic=deterministic)
            out = jnp.einsum("bhst,bthd->bshd", attn.astype(vh.dtype), vh).reshape(B, S, self.d_model)

        # remat tag: under remat_policy="save_attn" the rollout scan saves
        # this tensor so its backward re-forward skips the attention core
        out = checkpoint_name(out, "attn_core")
        out = nn.Dense(self.d_model, use_bias=self.bias, name="out_proj", dtype=self.compute_dtype)(out)
        out = out.astype(src.dtype)

        if no_valid_tgt is not None:
            out = jnp.where(no_valid_tgt[..., None], 0.0, out)

        if need_weights:
            w = jnp.mean(attn, axis=1)  # [B, S, T]
            if no_valid_tgt is not None:
                w = jnp.where(no_valid_tgt[..., None], 0.0, w)
            return out, w
        return out, None

    def _knn_attention(
        self, q, k, v, tgt_padding_mask, attn_mask, need_weights, deterministic
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Per-src-token targets: q [B, S, D], k/v [B, S, T, D], masks [B, S, T].

        Ref attention.py:117-124 (KNN attention) + the same NaN guard.
        """
        B, S, T, D = k.shape
        d_head = self.d_model // self.n_head

        invalid = tgt_padding_mask
        if attn_mask is not None:
            invalid = attn_mask if invalid is None else (invalid | attn_mask)
        no_valid_tgt = None if invalid is None else jnp.all(invalid, axis=-1)  # [B, S]

        qh = q.reshape(B, S, self.n_head, d_head)
        kh = k.reshape(B, S, T, self.n_head, d_head)
        vh = v.reshape(B, S, T, self.n_head, d_head)
        logits = jnp.einsum("bshd,bsthd->bhst", qh, kh).astype(jnp.float32)
        if invalid is not None:
            use_mask = invalid & (~no_valid_tgt[..., None])
            logits = jnp.where(use_mask[:, None], -jnp.inf, logits)
        attn = jax.nn.softmax(logits / np.sqrt(d_head), axis=-1)
        if self.dropout_p > 0:
            attn = nn.Dropout(self.dropout_p, name="attn_do")(attn, deterministic=deterministic)
        out = jnp.einsum("bhst,bsthd->bshd", attn.astype(vh.dtype), vh).reshape(B, S, self.d_model)
        out_proj = nn.Dense(self.d_model, use_bias=self.bias, name="out_proj", dtype=self.compute_dtype)
        return _finish_attention(out_proj, out, no_valid_tgt, attn, q.dtype, need_weights)


def _finish_attention(out_proj, out, no_valid_tgt, attn, src_dtype, need_weights):
    out = out_proj(out).astype(src_dtype)
    if no_valid_tgt is not None:
        out = jnp.where(no_valid_tgt[..., None], 0.0, out)
    if need_weights:
        w = jnp.mean(attn, axis=1)
        if no_valid_tgt is not None:
            w = jnp.where(no_valid_tgt[..., None], 0.0, w)
        return out, w
    return out, None


class TransformerCrossAttention(nn.Module):
    """One (pre/post-norm) cross-attention layer. Ref transformer.py:98-240."""

    d_model: int
    n_head: int
    d_feedforward: int = 128
    dropout_p: float = 0.1
    activation: str = "relu"
    norm_first: bool = True
    bias: bool = True
    decoder_self_attn: bool = False  # self-attn sublayer before the cross-attn
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        src_padding_mask: Optional[jnp.ndarray] = None,
        tgt: Optional[jnp.ndarray] = None,
        tgt_padding_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        need_weights: bool = False,
        deterministic: bool = True,
        tgt_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        return_tgt_kv: bool = False,
        allow_fused: bool = True,
        decoder_tgt: Optional[jnp.ndarray] = None,
        decoder_tgt_padding_mask: Optional[jnp.ndarray] = None,
        row_block: int = -1,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        act = _activation(self.activation)
        attn = Attention(
            d_model=self.d_model, n_head=self.n_head, dropout_p=self.dropout_p,
            bias=self.bias, compute_dtype=self.compute_dtype, name="attn",
        )
        dropout = lambda name: nn.Dropout(self.dropout_p, name=name) if self.dropout_p > 0 else None

        if return_tgt_kv:
            # precompute-only pass: norm + K/V projections of the (step-
            # invariant) target, nothing else
            tgt_n = nn.LayerNorm(epsilon=1e-5, name="norm_tgt")(tgt) if self.norm_first else tgt
            return attn(tgt_n, tgt=None, return_kv=True)

        if self.decoder_self_attn:
            # transformer-decoder self-attention sublayer (ref :161-184)
            attn_src = Attention(
                d_model=self.d_model, n_head=self.n_head, dropout_p=self.dropout_p,
                bias=self.bias, compute_dtype=self.compute_dtype, name="attn_src",
            )
            do_src = dropout("do_src")
            norm_src = nn.LayerNorm(epsilon=1e-5, name="norm_src")
            if self.norm_first:
                _s = norm_src(src)
                if decoder_tgt is None:
                    _s, _ = attn_src(_s, tgt_padding_mask=src_padding_mask,
                                     deterministic=deterministic, allow_fused=allow_fused,
                                     src_padding_mask=src_padding_mask)
                else:
                    # the reference applies the SAME norm_src to decoder_tgt
                    _s, _ = attn_src(_s, tgt=norm_src(decoder_tgt),
                                     tgt_padding_mask=decoder_tgt_padding_mask,
                                     deterministic=deterministic, allow_fused=allow_fused,
                                     src_padding_mask=src_padding_mask)
                src = src + (do_src(_s, deterministic=deterministic) if do_src else _s)
            else:
                if decoder_tgt is None:
                    _s, _ = attn_src(src, tgt_padding_mask=src_padding_mask,
                                     deterministic=deterministic, allow_fused=allow_fused,
                                     src_padding_mask=src_padding_mask)
                else:
                    _s, _ = attn_src(src, tgt=decoder_tgt,
                                     tgt_padding_mask=decoder_tgt_padding_mask,
                                     deterministic=deterministic, allow_fused=allow_fused,
                                     src_padding_mask=src_padding_mask)
                src = norm_src(
                    src + (do_src(_s, deterministic=deterministic) if do_src else _s)
                )

        if tgt is None and tgt_kv is None:
            tgt_padding_mask = src_padding_mask

        if self.norm_first:
            src2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
            tgt_n = nn.LayerNorm(epsilon=1e-5, name="norm_tgt")(tgt) if tgt is not None else None
        else:
            src2 = src
            tgt_n = tgt

        src2, attn_weights = attn(
            src2, tgt=tgt_n, tgt_padding_mask=tgt_padding_mask,
            attn_mask=attn_mask, need_weights=need_weights, deterministic=deterministic,
            tgt_kv=tgt_kv, allow_fused=allow_fused, src_padding_mask=src_padding_mask,
            row_block=row_block,
        )

        if self.d_feedforward > 0:
            do1 = dropout("do1")
            src = src + (do1(src2, deterministic=deterministic) if do1 else src2)
            if self.norm_first:
                src2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(src)
            else:
                src = nn.LayerNorm(epsilon=1e-5, name="norm1_post")(src)
                src2 = src
            src2 = act(nn.Dense(self.d_feedforward, name="linear1", dtype=self.compute_dtype)(src2))
            do_ff = dropout("do_ff")
            if do_ff:
                src2 = do_ff(src2, deterministic=deterministic)
            src2 = nn.Dense(self.d_model, name="linear2", dtype=self.compute_dtype)(src2).astype(src.dtype)
            do2 = dropout("do2")
            src = src + (do2(src2, deterministic=deterministic) if do2 else src2)
            if not self.norm_first:
                src = nn.LayerNorm(epsilon=1e-5, name="norm2_post")(src)
        else:
            # DenseTNT/VectorNet variant: activation residual, no FFN
            src2 = act(src2)
            do = dropout("do_dtnt")
            src = src + (do(src2, deterministic=deterministic) if do else src2)
            if not self.norm_first:
                src = nn.LayerNorm(epsilon=1e-5, name="norm1_post")(src)

        if src_padding_mask is not None:
            src = jnp.where(src_padding_mask[..., None], 0.0, src)
            if need_weights and attn_weights is not None:
                attn_weights = jnp.where(src_padding_mask[..., None], 0.0, attn_weights)
        return src, attn_weights


class TransformerBlock(nn.Module):
    """Stack of TransformerCrossAttention layers. Ref transformer.py:18-95."""

    d_model: int
    n_head: int = 2
    d_feedforward: int = 256
    dropout_p: float = 0.1
    activation: str = "relu"
    n_layer: int = 1
    norm_first: bool = True
    bias: bool = True
    out_layernorm: bool = False
    decoder_self_attn: bool = False
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        src_padding_mask: Optional[jnp.ndarray] = None,
        tgt: Optional[jnp.ndarray] = None,
        tgt_padding_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        need_weights: bool = False,
        deterministic: bool = True,
        tgt_kv: Optional[Sequence[Tuple[jnp.ndarray, jnp.ndarray]]] = None,  # per layer
        return_tgt_kv: bool = False,
        allow_fused: bool = True,
        decoder_tgt: Optional[jnp.ndarray] = None,
        decoder_tgt_padding_mask: Optional[jnp.ndarray] = None,
        row_block: int = -1,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        layers = [
            TransformerCrossAttention(
                d_model=self.d_model, n_head=self.n_head, d_feedforward=self.d_feedforward,
                dropout_p=self.dropout_p, activation=self.activation, norm_first=self.norm_first,
                bias=self.bias, decoder_self_attn=self.decoder_self_attn,
                compute_dtype=self.compute_dtype, name=f"layer{i}",
            )
            for i in range(self.n_layer)
        ]
        if return_tgt_kv:
            # the block feeds the SAME tgt to every layer, so each layer's
            # K/V cache comes from the same input through its own projections
            return tuple(l(None, tgt=tgt, return_tgt_kv=True) for l in layers)
        attn_weights = None
        for i, layer in enumerate(layers):
            src, attn_weights = layer(
                src, src_padding_mask=src_padding_mask, tgt=tgt,
                tgt_padding_mask=tgt_padding_mask, attn_mask=attn_mask,
                need_weights=need_weights, deterministic=deterministic,
                tgt_kv=None if tgt_kv is None else tgt_kv[i],
                allow_fused=allow_fused,
                decoder_tgt=decoder_tgt,
                decoder_tgt_padding_mask=decoder_tgt_padding_mask,
                row_block=row_block,
            )
        if self.out_layernorm:
            src = nn.LayerNorm(epsilon=1e-5, name="out_ln")(src)
        return src, attn_weights


class InputPeEncoder(nn.Module):
    """Attribute MLP combined with the pose PE. Ref input_pe_encoder.py:8-61."""

    hidden_dim: int
    pe_dim: int
    n_layer: int = 2
    mlp_dropout_p: Optional[float] = 0.1
    mlp_use_layernorm: bool = False
    pe_mode: str = "cat"  # input, cat, add
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, valid: jnp.ndarray, attr: jnp.ndarray, pe: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        if isinstance(attr, tuple) and self.pe_mode == "input":
            # pair-factored attrs can't join the PE concat — materialize
            a, b = attr
            shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
            attr = jnp.concatenate(
                [
                    jnp.broadcast_to(a, shape + a.shape[-1:]),
                    jnp.broadcast_to(b, shape + b.shape[-1:]),
                ],
                axis=-1,
            )
        if self.pe_mode == "input":
            out_dim = self.hidden_dim
            x_in = jnp.concatenate([attr, pe], axis=-1)
        elif self.pe_mode == "cat":
            out_dim = self.hidden_dim - self.pe_dim
            assert out_dim >= 32
            x_in = attr
        elif self.pe_mode == "add":
            out_dim = self.hidden_dim
            assert self.pe_dim == self.hidden_dim
            x_in = attr
        else:
            raise NotImplementedError(self.pe_mode)

        # cat mode: instead of concat([mlp_out, pe]) run the last MLP layer
        # tail-padded to hidden_dim (exact zeros past out_dim) and ADD the
        # left-padded PE — bit-identical, but the combine fuses into the
        # matmul's elementwise epilogue instead of materializing both the
        # narrow [..., out_dim] matmul result (4.8x tile padding at the map's
        # [B, P, 20, 32]) and a separate concatenated copy.
        fold_cat = self.pe_mode == "cat" and not (
            isinstance(x_in, tuple) and self.n_layer == 1
        )
        x = MLP(
            [out_dim] * self.n_layer,
            dropout_p=self.mlp_dropout_p,
            use_layernorm=self.mlp_use_layernorm,
            end_layer_activation=False,
            compute_dtype=self.compute_dtype,
            pad_last_to=self.hidden_dim if fold_cat else 0,
            name="mlp",
        )(x_in, deterministic=deterministic)

        if fold_cat:
            x = x + jnp.pad(pe, [(0, 0)] * (pe.ndim - 1) + [(out_dim, 0)])
        elif self.pe_mode == "cat":
            x = jnp.concatenate([x, pe], axis=-1)
        elif self.pe_mode == "add":
            x = x + pe
        return jnp.where(valid[..., None], x, 0.0)


def temporal_aggregate(x: jnp.ndarray, valid: jnp.ndarray, mode: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate a [B, T, A, D] sequence over T. Ref agent_temporal.py:7-39.

    Returns ([B, A, D], [B, A]).
    """
    if mode == "max":
        agg = jnp.max(x, axis=1)
    elif mode == "last":
        agg = x[:, -1]
    elif mode == "max_valid":
        agg = jnp.max(jnp.where(valid[..., None], x, -1e3), axis=1)
    elif mode == "last_valid":
        n_step = valid.shape[1]
        # index of last valid step (first True scanning backwards)
        idx = n_step - 1 - jnp.argmax(valid[:, ::-1], axis=1)  # [B, A]
        agg = jnp.take_along_axis(x, idx[:, None, :, None], axis=1)[:, 0]
    elif mode == "mean_valid":
        denom = jnp.sum(valid, axis=1) + jnp.finfo(x.dtype).eps
        agg = jnp.sum(x, axis=1) / denom[..., None]
    else:
        raise NotImplementedError(mode)
    valid_agg = jnp.any(valid, axis=1)
    return jnp.where(valid_agg[..., None], agg, 0.0), valid_agg


class FusedGRUCell(nn.Module):
    """GRU cell with gate-fused projections: 2 matmuls per step instead of 6.

    Same math as torch nn.GRUCell / flax GRUCell (h' = (1-z)*n + z*h, gates
    in (r, z, n) order): the three input-side and three hidden-side gate
    projections are stored concatenated, so the rollout scan issues one
    [.., D]x[D, 3H] and one [.., H]x[H, 3H] matmul — 3x wider MXU tiles and
    1/3 the op count of separate per-gate Dense calls. Each output element
    is still the same-length dot product, so numerics match the unfused form
    to float rounding.
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_dim
        w_i = self.param("w_i", nn.initializers.lecun_normal(), (x.shape[-1], 3 * H))
        w_h = self.param("w_h", nn.initializers.orthogonal(), (H, 3 * H))
        b_i = self.param("b_i", nn.initializers.zeros_init(), (3 * H,))
        b_hn = self.param("b_hn", nn.initializers.zeros_init(), (H,))
        gi = x @ w_i + b_i
        gh = h @ w_h
        r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi[..., H : 2 * H] + gh[..., H : 2 * H])
        n = jnp.tanh(gi[..., 2 * H :] + r * (gh[..., 2 * H :] + b_hn))
        return (1.0 - z) * n + z * h


class StackedGRU(nn.Module):
    """num_layers GRU cells over flattened (batch*agent) rows.

    Ref agent_temporal.py:111-153 (MultiAgentGRULoop). The hidden state is
    zeroed for invalid agents after every step. Single-step mode consumes
    x [B, A, D] + h [L, B, A, D]; sequence mode scans over the step axis of
    x [B, T, A, D] (used by the latent/dest encoders).
    """

    hidden_dim: int
    num_layers: int = 3
    dropout: float = 0.1
    # "gru_loop" masks hidden/output for invalid agents per step (default);
    # "gru_unmasked" is the TrafficSim ablation (ref agent_temporal.py:156-193);
    # "dummy" passes features through untouched (ref agent_temporal.py:42-47)
    kind: str = "gru_loop"

    def setup(self):
        self.cells = [FusedGRUCell(self.hidden_dim, name=f"gru{i}") for i in range(self.num_layers)]
        if self.dropout > 0:
            self.do = nn.Dropout(self.dropout)
        else:
            self.do = None

    def _step(self, x, valid, h, deterministic):
        """x [B, A, D], valid [B, A], h [L, B, A, D] -> (y, h')."""
        if self.kind == "dummy":
            return jnp.where(valid[..., None], x, 0.0), h
        hs = []
        inp = x
        for i, cell in enumerate(self.cells):
            h_i = cell(h[i], inp)
            inp = h_i
            if self.do is not None and i + 1 != self.num_layers:
                inp = self.do(inp, deterministic=deterministic)
            hs.append(h_i)
        h_new = jnp.stack(hs, axis=0)
        if self.kind == "gru_unmasked":
            return inp, h_new
        invalid = ~valid[..., None]
        h_new = jnp.where(invalid[None], 0.0, h_new)
        y = jnp.where(invalid, 0.0, inp)
        return y, h_new

    def init_hidden(self, batch_shape: Tuple[int, ...]) -> jnp.ndarray:
        return jnp.zeros((self.num_layers, *batch_shape, self.hidden_dim))

    def __call__(
        self,
        x: jnp.ndarray,
        valid: jnp.ndarray,
        h: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if valid.ndim == 2:  # single step
            if h is None:
                h = self.init_hidden(valid.shape)
            return self._step(x, valid, h, deterministic)
        # sequence mode: scan over T (keeps compile time O(1) in T)
        B, T, A = valid.shape
        if h is None:
            h = self.init_hidden((B, A))

        def body(mdl, h, xs):
            x_t, v_t = xs
            y, h = mdl._step(x_t, v_t, h, deterministic)
            return h, y

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
        )
        _, ys = scan(self, h, (jnp.moveaxis(x, 1, 0), jnp.moveaxis(valid, 1, 0)))
        return jnp.moveaxis(ys, 0, 1), None


class MultiAgentTF(nn.Module):
    """Self-attention among agents at one step. Ref agent_interaction.py:9-107.

    The reference special-cases batch rows with a single valid agent by
    slicing them out in Python (their features pass through unchanged); here
    the transformer always runs and a per-row select restores the input for
    those rows — same semantics, no dynamic shapes.
    """

    hidden_dim: int
    n_layer: int = 3
    mask_self_agent: bool = True
    detach_tgt: bool = False
    attn_to_map_aware_feature: bool = True
    tf_kwargs: dict = None
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feature_map_aware: jnp.ndarray,  # [B(, T), A, D]
        feature: jnp.ndarray,
        valid: jnp.ndarray,  # [B(, T), A]
        need_weights: bool = False,
        deterministic: bool = True,
        allow_fused: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        tf_kwargs = dict(self.tf_kwargs or {})
        seq = valid.ndim == 3
        if seq:
            B, T, A = valid.shape
            fma = feature_map_aware.reshape(B * T, A, -1)
            f = feature.reshape(B * T, A, -1)
            v = valid.reshape(B * T, A)
        else:
            fma, f, v = feature_map_aware, feature, valid
            A = v.shape[-1]

        x = fma
        tgt = fma if self.attn_to_map_aware_feature else f
        if self.detach_tgt:
            tgt = jax.lax.stop_gradient(tgt)

        attn_mask = jnp.eye(A, dtype=bool)[None] if self.mask_self_agent else None
        out, w = TransformerBlock(
            d_model=self.hidden_dim, n_layer=self.n_layer,
            compute_dtype=self.compute_dtype, name="tf", **tf_kwargs,
        )(
            x, src_padding_mask=~v, tgt=tgt, tgt_padding_mask=~v,
            attn_mask=attn_mask, need_weights=need_weights, deterministic=deterministic,
            allow_fused=allow_fused,
        )

        if self.mask_self_agent:
            # rows with <=1 valid agent keep the raw input (ref :61-93)
            single = jnp.sum(v, axis=-1) == 1
            out = jnp.where(single[:, None, None], x, out)
            if need_weights and w is not None:
                w = jnp.where(single[:, None, None], 0.0, w)

        if seq:
            out = out.reshape(B, T, A, -1)
            if w is not None:
                w = w.reshape(B, T, A, A)
        return out, w


class AddLatentGoal(nn.Module):
    """Inject a latent/goal feature into the policy feature.

    Ref add_latent_goal.py:9-77 incl. the res_add/res_cat variants and the
    z_valid gating (invalid-z agents keep the raw feature).
    """

    hidden_dim: int
    in_dim: int
    dummy: bool = False
    mode: str = "cat"  # add, mul, cat
    res_cat: bool = False
    res_add: bool = True
    n_layer_mlp_in: int = 2
    n_layer_mlp_out: int = 2
    mlp_in_use_layernorm: bool = False
    mlp_out_use_layernorm: bool = False
    mlp_dropout_p: float = 0.1

    def setup(self):
        if self.dummy:
            return
        self.mlp_in = MLP(
            [self.hidden_dim] * self.n_layer_mlp_in,
            dropout_p=self.mlp_dropout_p, use_layernorm=self.mlp_in_use_layernorm, name="mlp_in",
        )
        self.mlp_out = MLP(
            [self.hidden_dim] * self.n_layer_mlp_out,
            dropout_p=self.mlp_dropout_p, use_layernorm=self.mlp_out_use_layernorm, name="mlp_out",
        )
        if self.res_cat:
            self.mlp_res_cat = MLP(
                [self.hidden_dim] * self.n_layer_mlp_out,
                dropout_p=self.mlp_dropout_p, use_layernorm=self.mlp_out_use_layernorm, name="mlp_res_cat",
            )

    def precompute_z(self, z: jnp.ndarray, z_valid: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """The z-side input MLP. Its input (goal feature / latent sample) is
        constant across a rollout, so the hot loop hoists this out of the
        scan — 2 matmuls x 90 steps saved per injection site (PERF.md lever:
        policy-step MLP chains). Only valid when dropout noise is off
        (deterministic), which is the eval rollout."""
        return self.mlp_in(z, z_valid, deterministic=deterministic)

    def __call__(
        self,
        x: jnp.ndarray,  # [B, A, D]
        x_valid: jnp.ndarray,  # [B, A]
        z: Optional[jnp.ndarray],  # [B, A, in_dim]
        z_valid: Optional[jnp.ndarray],
        deterministic: bool = True,
        z_pre: Optional[jnp.ndarray] = None,  # precompute_z output
    ) -> jnp.ndarray:
        if self.dummy:
            return jnp.where(x_valid[..., None], x, 0.0)

        z = z_pre if z_pre is not None else self.precompute_z(z, z_valid, deterministic)

        if self.mode == "add":
            h = x + z
        elif self.mode == "mul":
            h = x * z
        else:
            h = jnp.concatenate([x, z], axis=-1)

        h = self.mlp_out(h, deterministic=deterministic)

        if self.res_cat:
            h = self.mlp_res_cat(
                jnp.concatenate([x, h, z], axis=-1), deterministic=deterministic
            )

        h = jnp.where(z_valid[..., None], h, 0.0)
        if self.res_add:  # h + x if z_valid else x
            h = h + x
        else:  # h if z_valid else x
            h = h + jnp.where(z_valid[..., None], 0.0, x)
        return jnp.where(x_valid[..., None], h, 0.0)


class ActionHead(nn.Module):
    """DiagGaussian action head with optional per-type branches.

    Ref action_head.py:9-98: branch_type=True sums 3 per-type MLPs under the
    type masks; per-type trainable log_std initialized at -2
    (configs/model/traffic_bots.yaml:135-138).
    """

    hidden_dim: int
    action_dim: int = 2
    use_layernorm: bool = False
    log_std_init: Optional[float] = -2.0
    branch_type: bool = True

    def _branch_mlps(self, x, mask_type, prefix: str, deterministic: bool) -> jnp.ndarray:
        """Sum of 3 per-type 2-layer MLPs under the type masks.

        Fused form: the three branches' weights are stacked so one
        [.., D]x[D, 3H] matmul + one batched [3] matmul replace 6 small
        matmuls in the rollout hot loop; the masked per-type sum becomes an
        einsum over the (disjoint) type one-hot — same math as masking each
        branch's output to 0 and adding (ref action_head.py:69-87).
        Falls back to the unfused MLPs when layernorm is on (LN sits between
        the layers and does not stack).
        """
        if self.use_layernorm:
            out = 0.0
            for i in range(3):
                out += MLP(
                    [self.hidden_dim, self.action_dim],
                    end_layer_activation=False, use_layernorm=True,
                    dropout_p=None, name=f"{prefix}{i}",
                )(x, mask_type[:, :, i], deterministic=deterministic)
            return out
        D = x.shape[-1]
        # leading axis 3 is a branch (batch) axis, NOT receptive field:
        # declare it so fan_in stays D and each stacked branch initializes
        # identically to a standalone Dense (lecun_normal over (3, D, H)
        # would otherwise compute fan_in = 3*D, sqrt(3) too small)
        init = nn.initializers.lecun_normal(batch_axis=(0,))
        w0 = self.param(f"{prefix}_w0", init, (3, D, self.hidden_dim))
        b0 = self.param(f"{prefix}_b0", nn.initializers.zeros_init(), (3, self.hidden_dim))
        w1 = self.param(f"{prefix}_w1", init, (3, self.hidden_dim, self.action_dim))
        b1 = self.param(f"{prefix}_b1", nn.initializers.zeros_init(), (3, self.action_dim))
        h = nn.relu(jnp.einsum("...d,tdh->...th", x, w0) + b0)
        out = jnp.einsum("...th,the->...te", h, w1) + b1
        return jnp.einsum("...te,...t->...e", out, mask_type.astype(x.dtype))

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid: jnp.ndarray, agent_type: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mean [B, A, 2], log_std [B, A, 2])."""
        if self.branch_type:
            mask_type = agent_type & valid[..., None]  # [B, A, 3]
            mean = self._branch_mlps(x, mask_type, "mlp_mean", deterministic)
            if self.log_std_init is None:
                log_std = self._branch_mlps(x, mask_type, "mlp_log_std", deterministic)
            else:
                log_std_p = self.param(
                    "log_std", lambda k: jnp.full((3, self.action_dim), self.log_std_init)
                )
                log_std = jnp.einsum("bat,td->bad", mask_type.astype(x.dtype), log_std_p)
        else:
            mean = MLP(
                [self.hidden_dim, self.action_dim],
                end_layer_activation=False, use_layernorm=self.use_layernorm,
                dropout_p=None, name="mlp_mean",
            )(x, valid, deterministic=deterministic)
            if self.log_std_init is None:
                log_std = MLP(
                    [self.hidden_dim, self.action_dim],
                    end_layer_activation=False, use_layernorm=self.use_layernorm,
                    dropout_p=None, name="mlp_log_std",
                )(x, valid, deterministic=deterministic)
            else:
                log_std_p = self.param(
                    "log_std", lambda k: jnp.full((self.action_dim,), self.log_std_init)
                )
                log_std = jnp.broadcast_to(log_std_p, mean.shape)
        return mean, log_std
