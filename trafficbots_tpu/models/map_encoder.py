"""Polyline map encoder (VectorNet / DenseTNT style).

Ref /root/reference/src/models/modules/map_encoder.py:11-115. The per-node
encoder runs either a DenseTNT self-attention over the 20 nodes of each
polyline (default) or the VectorNet max-pool-concat MLP stack, followed by a
pool over nodes and a single self-attention layer over the 1024 polylines.
This is the heaviest encoder (SURVEY.md section 3.1) — shapes are static and
batched as [n_scene*n_pl, n_node, d] so XLA tiles it onto the MXU.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import InputPeEncoderConfig, MapEncoderConfig, TransformerConfig
from .modules import MLP, InputPeEncoder, TransformerBlock


def tf_block_kwargs(tf_cfg: TransformerConfig) -> dict:
    return dict(
        d_model=tf_cfg.d_model,
        n_head=tf_cfg.n_head,
        d_feedforward=tf_cfg.d_feedforward,
        dropout_p=tf_cfg.dropout_p,
        activation=tf_cfg.activation,
        norm_first=tf_cfg.norm_first,
        bias=tf_cfg.bias,
        out_layernorm=tf_cfg.out_layernorm,
    )


class MapEncoder(nn.Module):
    hidden_dim: int
    pe_dim: int
    cfg: MapEncoderConfig
    pe_cfg: InputPeEncoderConfig
    tf_cfg: TransformerConfig
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        map_valid: jnp.ndarray,  # [n_scene, n_pl, n_node] bool
        map_attr: jnp.ndarray,  # [n_scene, n_pl, n_node, attr_dim]
        map_pe: jnp.ndarray,  # [n_scene, n_pl, n_node, pe_dim]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (map_feature [n_scene, n_pl, d], map_valid [n_scene, n_pl])."""
        import jax

        n_scene, n_pl, n_node = map_valid.shape
        tf_kwargs = tf_block_kwargs(self.tf_cfg)

        pl_feature = InputPeEncoder(
            hidden_dim=self.hidden_dim,
            pe_dim=self.pe_dim,
            n_layer=self.pe_cfg.n_layer,
            mlp_dropout_p=self.pe_cfg.mlp_dropout_p,
            mlp_use_layernorm=self.pe_cfg.mlp_use_layernorm,
            pe_mode=self.pe_cfg.pe_mode,
            compute_dtype=self.compute_dtype,
            name="input_pe",
        )(map_valid, map_attr, map_pe, deterministic=deterministic)

        if self.cfg.densetnt_vectornet:
            flat = pl_feature.reshape(n_scene * n_pl, n_node, self.hidden_dim)
            flat_valid = map_valid.reshape(n_scene * n_pl, n_node)
            # FusedNodeEncoder implements exactly the default layer recipe
            # (pre-norm, relu, biases, no out-LN, fp32 compute); any other
            # TransformerConfig falls back to the generic TransformerBlock so
            # config switches are never silently ignored
            use_fused_stack = (
                self.tf_cfg.norm_first
                and self.tf_cfg.d_feedforward > 0
                and self.tf_cfg.activation == "relu"
                and self.tf_cfg.bias
                and not self.tf_cfg.out_layernorm
            )
            if use_fused_stack:
                from ..ops.node_encoder import FusedNodeEncoder

                stack = FusedNodeEncoder(
                    d_model=self.hidden_dim, n_head=self.tf_cfg.n_head,
                    n_layer=self.cfg.n_layer, d_feedforward=self.tf_cfg.d_feedforward,
                    dropout_p=self.tf_cfg.dropout_p, block_pl=self.cfg.fused_block_pl,
                    matmul_bf16=self.cfg.kernel_matmul_bf16,
                    pipeline_blocks=self.cfg.fused_pipeline_blocks,
                    skip_invalid_blocks=self.cfg.fused_skip_invalid_blocks,
                    name="densetnt",
                )
                fused_pool_ok = (
                    deterministic
                    and self.cfg.pool_mode == "max"
                    and jax.default_backend() == "tpu"
                    and (n_scene * n_pl) % (stack.block_pl * max(1, stack.pipeline_blocks)) == 0
                )
                # training: the custom-VJP kernel pair with in-kernel
                # dropout — the node stack is the most expensive module in
                # the train step and its XLA fwd+BPTT-bwd dominates
                fused_train_ok = (
                    not deterministic
                    and self.cfg.fused_train_kernel
                    and self.cfg.pool_mode == "max"
                    and jax.default_backend() == "tpu"
                    and (n_scene * n_pl) % stack.block_pl == 0
                )
                if fused_pool_ok:
                    # the map encoder dominates the eval profile; "hybrid"
                    # runs projections/FFN as big XLA matmuls with a Pallas
                    # kernel for just the per-polyline attention core,
                    # "fused" keeps everything in one VMEM-resident kernel
                    if self.cfg.node_encoder_impl == "hybrid":
                        pooled = stack.encode_pooled_hybrid(flat, flat_valid)
                    else:
                        pooled = stack.encode_pooled(flat, flat_valid)
                    pooled_feature = pooled.reshape(n_scene, n_pl, self.hidden_dim)
                elif fused_train_ok:
                    key = self.make_rng("dropout") if self.tf_cfg.dropout_p > 0 else jax.random.PRNGKey(0)
                    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
                    pooled = stack.encode_pooled_train(flat, flat_valid, seed)
                    pooled_feature = pooled.reshape(n_scene, n_pl, self.hidden_dim)
                else:
                    pooled_feature = None
                    flat = stack(flat, flat_valid, deterministic=deterministic)
            else:
                pooled_feature = None
                flat, _ = TransformerBlock(
                    n_layer=self.cfg.n_layer, compute_dtype=self.compute_dtype,
                    name="densetnt", **tf_kwargs,
                )(
                    flat, src_padding_mask=~flat_valid, tgt=flat,
                    tgt_padding_mask=~flat_valid, deterministic=deterministic,
                )
            if pooled_feature is None:
                pl_feature = flat.reshape(n_scene, n_pl, n_node, self.hidden_dim)
        else:
            pooled_feature = None
            # VectorNet: per-node MLP to d/2, concat with max-pooled context
            for i in range(self.cfg.n_layer):
                is_last = i == self.cfg.n_layer - 1
                end_act = (not self.tf_cfg.norm_first) if is_last else True
                enc = MLP(
                    [self.hidden_dim // 2],
                    dropout_p=self.cfg.mlp_dropout_p,
                    use_layernorm=self.cfg.mlp_use_layernorm,
                    end_layer_activation=end_act,
                    name=f"vn_mlp{i}",
                )(pl_feature, map_valid, fill_invalid=float("-inf"), deterministic=deterministic)
                pooled = jnp.max(enc, axis=2, keepdims=True)
                pl_feature = jnp.concatenate(
                    [enc, jnp.broadcast_to(pooled, enc.shape)], axis=-1
                )

        if pooled_feature is not None:
            pl_feature = pooled_feature  # kernel already pooled (masked max)
        elif self.cfg.pool_mode == "max":
            pl_feature = jnp.where(map_valid[..., None], pl_feature, float("-inf"))
            pl_feature = jnp.max(pl_feature, axis=2)
        elif self.cfg.pool_mode == "first":
            pl_feature = pl_feature[:, :, 0]
        elif self.cfg.pool_mode == "mean":
            pl_feature = jnp.where(map_valid[..., None], pl_feature, 0.0)
            denom = jnp.sum(map_valid, axis=-1, keepdims=True) + jnp.finfo(pl_feature.dtype).eps
            pl_feature = jnp.sum(pl_feature, axis=2) / denom
        else:
            raise NotImplementedError(self.cfg.pool_mode)

        pl_valid = jnp.any(map_valid, axis=-1)
        pl_feature = jnp.where(pl_valid[..., None], pl_feature, 0.0)

        pl_feature, _ = TransformerBlock(
            n_layer=1, compute_dtype=self.compute_dtype, name="self_attn", **tf_kwargs
        )(
            pl_feature, src_padding_mask=~pl_valid, tgt=pl_feature,
            tgt_padding_mask=~pl_valid, deterministic=deterministic,
            # fused: XLA's [B, H, 1024, 1024] logits scale with batch
        )
        return pl_feature, pl_valid
