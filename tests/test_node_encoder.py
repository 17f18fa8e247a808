"""FusedNodeEncoder parity: XLA path == TransformerBlock, kernel == XLA path."""
import numpy as np
import jax
import jax.numpy as jnp

from trafficbots_tpu.models.modules import TransformerBlock
from trafficbots_tpu.ops.node_encoder import (
    FusedNodeEncoder,
    stack_params_from_transformer_block,
)

D, H, L, F, N = 16, 2, 3, 16, 5
BP = 16  # multiple of block_pl=8


def _data(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    x = jax.random.normal(ks[0], (BP, N, D))
    valid = jax.random.bernoulli(ks[1], 0.8, (BP, N))
    valid = valid.at[0].set(False)  # one fully-invalid polyline
    valid = valid.at[1].set(True)
    x = jnp.where(valid[..., None], x, 0.0)
    return x, valid


def test_xla_path_matches_transformer_block():
    x, valid = _data()
    tb = TransformerBlock(d_model=D, n_head=H, n_layer=L, d_feedforward=F, dropout_p=0.0)
    tb_params = tb.init(
        jax.random.PRNGKey(1),
        x.reshape(BP, N, D), ~valid, x.reshape(BP, N, D), ~valid,
    )["params"]
    out_tb, _ = tb.apply(
        {"params": tb_params}, x, src_padding_mask=~valid, tgt=x, tgt_padding_mask=~valid
    )

    fused = FusedNodeEncoder(d_model=D, n_head=H, n_layer=L, d_feedforward=F, dropout_p=0.0)
    fparams = stack_params_from_transformer_block(tb_params, L)
    out_f = fused.apply({"params": fparams}, x, valid)
    np.testing.assert_allclose(np.asarray(out_tb), np.asarray(out_f), rtol=1e-5, atol=1e-5)


def test_kernel_matches_xla_path_with_pool():
    x, valid = _data(seed=3)
    fused = FusedNodeEncoder(d_model=D, n_head=H, n_layer=L, d_feedforward=F, dropout_p=0.0)
    params = fused.init(jax.random.PRNGKey(2), x, valid)["params"]

    out_nodes = fused.apply({"params": params}, x, valid)
    ref_pooled = jnp.max(jnp.where(valid[..., None], out_nodes, -jnp.inf), axis=1)

    pooled = fused.apply({"params": params}, x, valid, method="encode_pooled")
    assert pooled.shape == (BP, D)
    vn = np.asarray(jnp.any(valid, axis=-1))
    np.testing.assert_allclose(
        np.asarray(pooled)[vn], np.asarray(ref_pooled)[vn], rtol=1e-4, atol=1e-4
    )
    # fully-invalid polyline: huge negative (zeroed by pl_valid downstream)
    assert (np.asarray(pooled)[~vn] < -1e20).all()


def test_kernel_skips_fully_invalid_blocks():
    """Whole grid steps of padding polylines (the map's fixed 1024 capacity
    vs a variable real prefix) take the skip path; valid prefix unchanged."""
    x, valid = _data(seed=7)
    # second grid step (polylines 8..15 at block_pl=8) entirely padding
    valid = valid.at[8:].set(False)
    x = jnp.where(valid[..., None], x, 0.0)
    fused = FusedNodeEncoder(d_model=D, n_head=H, n_layer=L, d_feedforward=F, dropout_p=0.0)
    params = fused.init(jax.random.PRNGKey(2), x, valid)["params"]

    skip = fused.apply({"params": params}, x, valid, method="encode_pooled")
    noskip = FusedNodeEncoder(
        d_model=D, n_head=H, n_layer=L, d_feedforward=F, dropout_p=0.0,
        skip_invalid_blocks=False,
    ).apply({"params": params}, x, valid, method="encode_pooled")

    np.testing.assert_array_equal(np.asarray(skip), np.asarray(noskip))
    assert (np.asarray(skip)[8:] < -1e20).all()


def test_pipelined_kernel_matches_single_block():
    """pipeline_blocks=2 (two sub-blocks per grid step sharing wide
    LN/projection/FFN matmuls) must be bit-identical to the single-block
    kernel — row count cannot change per-element MXU accumulation order."""
    x, valid = _data(seed=5)
    f1 = FusedNodeEncoder(d_model=D, n_head=H, n_layer=L, d_feedforward=F,
                          dropout_p=0.0, pipeline_blocks=1)
    f2 = FusedNodeEncoder(d_model=D, n_head=H, n_layer=L, d_feedforward=F,
                          dropout_p=0.0, pipeline_blocks=2)
    params = f1.init(jax.random.PRNGKey(2), x, valid)["params"]
    p1 = f1.apply({"params": params}, x, valid, method="encode_pooled")
    p2 = f2.apply({"params": params}, x, valid, method="encode_pooled")
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_hybrid_matches_xla_path_with_pool():
    """encode_pooled_hybrid (XLA projections + Pallas score core) == XLA ref."""
    x, valid = _data(seed=4)
    fused = FusedNodeEncoder(d_model=D, n_head=H, n_layer=L, d_feedforward=F, dropout_p=0.0)
    params = fused.init(jax.random.PRNGKey(2), x, valid)["params"]

    out_nodes = fused.apply({"params": params}, x, valid)
    ref_pooled = jnp.max(jnp.where(valid[..., None], out_nodes, -jnp.inf), axis=1)

    pooled = fused.apply({"params": params}, x, valid, method="encode_pooled_hybrid")
    assert pooled.shape == (BP, D)
    vn = np.asarray(jnp.any(valid, axis=-1))
    np.testing.assert_allclose(
        np.asarray(pooled)[vn], np.asarray(ref_pooled)[vn], rtol=1e-4, atol=1e-4
    )
    assert (np.asarray(pooled)[~vn] < -1e20).all()


def test_dropout_path_runs_in_training():
    x, valid = _data(seed=4)
    fused = FusedNodeEncoder(d_model=D, n_head=H, n_layer=L, d_feedforward=F, dropout_p=0.2)
    params = fused.init(jax.random.PRNGKey(2), x, valid)["params"]
    out = fused.apply(
        {"params": params}, x, valid, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(9)},
    )
    assert np.isfinite(np.asarray(out)).all()
