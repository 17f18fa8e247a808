
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Decompose the map encoder cost on the real chip (scratch, for PERF.md)."""
import json
import time

import numpy as np


def timed(fn, args, n=6):
    import jax

    f = jax.jit(fn)
    float(np.asarray(f(*args)).ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from flax.core import freeze

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu import orchestration as O
    from trafficbots_tpu.data.preprocessing import pre_processing
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch

    n_scene = 32
    cfg = ExperimentConfig()
    batch_np = synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
    pbatch = jax.jit(lambda b: pre_processing(b, cfg.model, training=False))(batch)

    out = {}
    mv, ma, mp = pbatch["input/map_valid"], pbatch["input/map_attr"], pbatch["input/map_pe"]

    # full map encoder
    def f_map(params, mv, ma, mp):
        mf, _ = model.apply({"params": params}, method="map_only",
                            map_valid=mv, map_attr=ma, map_pe=mp)
        return jnp.sum(mf)

    out["map_full_ms"] = timed(f_map, (params, mv, ma, mp)) * 1e3

    # input_pe encoder alone (the attr MLP + PE concat)
    from trafficbots_tpu.models.modules import InputPeEncoder
    from trafficbots_tpu.geometry import pose_pe_out_dim

    ipe = InputPeEncoder(
        hidden_dim=cfg.model.hidden_dim,
        pe_dim=pose_pe_out_dim(cfg.model.pose_pe_map, cfg.model.pe_dim),
        n_layer=cfg.model.input_pe_encoder.n_layer,
        mlp_dropout_p=cfg.model.input_pe_encoder.mlp_dropout_p,
        mlp_use_layernorm=cfg.model.input_pe_encoder.mlp_use_layernorm,
        pe_mode=cfg.model.input_pe_encoder.pe_mode,
    )
    p_ipe = {"params": params["map_encoder"]["input_pe"]}

    def f_ipe(p, mv, ma, mp):
        return jnp.sum(ipe.apply(p, mv, ma, mp))

    out["input_pe_ms"] = timed(f_ipe, (p_ipe, mv, ma, mp)) * 1e3

    # node kernel alone (fused stack + pool)
    from trafficbots_tpu.ops.node_encoder import FusedNodeEncoder

    feat = jax.jit(lambda p, mv, ma, mp: ipe.apply(p, mv, ma, mp))(p_ipe, mv, ma, mp)
    B, P, N, D = feat.shape
    flat = feat.reshape(B * P, N, D)
    flat_valid = mv.reshape(B * P, N)
    stack = FusedNodeEncoder(
        d_model=cfg.model.hidden_dim, n_head=cfg.model.tf_cfg.n_head,
        n_layer=cfg.model.map_encoder.n_layer, d_feedforward=cfg.model.tf_cfg.d_feedforward,
        dropout_p=cfg.model.tf_cfg.dropout_p, block_pl=cfg.model.map_encoder.fused_block_pl,
    )
    p_stack = {"params": params["map_encoder"]["densetnt"]}

    def f_node(p, flat, flat_valid):
        return jnp.sum(stack.apply(p, flat, flat_valid, method="encode_pooled"))

    out["node_kernel_ms"] = timed(f_node, (p_stack, flat, flat_valid)) * 1e3

    # polyline self-attention alone
    from trafficbots_tpu.models.modules import TransformerBlock
    from trafficbots_tpu.models.map_encoder import tf_block_kwargs

    pooled = jax.jit(lambda p, f, v: stack.apply(p, f, v, method="encode_pooled"))(
        p_stack, flat, flat_valid
    ).reshape(B, P, D)
    pl_valid = jnp.any(mv, axis=-1)
    blk = TransformerBlock(n_layer=1, **tf_block_kwargs(cfg.model.tf_cfg))
    p_blk = {"params": params["map_encoder"]["self_attn"]}

    def f_sa(p, x, v):
        y, _ = blk.apply(p, x, src_padding_mask=~v, tgt=x, tgt_padding_mask=~v,
                         allow_fused=False)
        return jnp.sum(y)

    out["pl_self_attn_ms"] = timed(f_sa, (p_blk, pooled, pl_valid)) * 1e3

    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
