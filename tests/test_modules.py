"""Unit tests for NN building blocks: masking quirks, NaN guards, aggregates.

These check the load-bearing semantics called out in SURVEY.md section 7
(hard part #5): MLP masks invalid rows BEFORE the end-layer activation,
attention rows whose targets are all invalid must be zero (not NaN), and the
temporal aggregation modes follow ref agent_temporal.py:7-39.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbots_tpu.models.modules import (
    MLP,
    Attention,
    StackedGRU,
    TransformerBlock,
    temporal_aggregate,
)


def test_mlp_invalid_rows_are_act_of_fill():
    """Ref mlp.py:80-84: mask applied pre-end-activation, so invalid rows
    become relu(fill_invalid)."""
    mlp = MLP([8, 8], dropout_p=0.0, end_layer_activation=True)
    x = jnp.ones((2, 3, 4))
    valid = jnp.array([[True, False, True], [False, True, True]])
    params = mlp.init(jax.random.PRNGKey(0), x, valid)
    fill = -7.0
    out = mlp.apply(params, x, valid, fill_invalid=fill)
    invalid_rows = np.asarray(out)[~np.asarray(valid)]
    # relu(-7) == 0
    np.testing.assert_allclose(invalid_rows, 0.0)
    fill = 3.0
    out = mlp.apply(params, x, valid, fill_invalid=fill)
    invalid_rows = np.asarray(out)[~np.asarray(valid)]
    np.testing.assert_allclose(invalid_rows, 3.0)  # relu(3) == 3


def test_attention_all_invalid_targets_zero_not_nan():
    """Ref attention.py:101-107,144-146."""
    attn = Attention(d_model=16, n_head=2, dropout_p=0.0)
    src = jnp.ones((2, 3, 16))
    tgt = jnp.ones((2, 5, 16))
    # batch 0: all targets invalid; batch 1: some valid
    pad = jnp.array([[True] * 5, [False, True, False, True, True]])
    params = attn.init(jax.random.PRNGKey(0), src, tgt, pad)
    out, w = attn.apply(params, src, tgt, pad, need_weights=True)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], 0.0)
    assert np.abs(out[1]).sum() > 0
    # attention weights on invalid targets must be ~0 for valid rows
    w = np.asarray(w)
    assert w[1][:, 1].max() < 1e-6
    assert w[1][:, 3].max() < 1e-6


def test_attention_attn_mask_composes():
    attn = Attention(d_model=8, n_head=1, dropout_p=0.0)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
    # self-attention with self-masking (eye) like agent_interaction.py:57-59
    eye = jnp.eye(4, dtype=bool)[None]
    params = attn.init(jax.random.PRNGKey(0), src, None, None, eye)
    _, w = attn.apply(params, src, None, None, eye, need_weights=True)
    w = np.asarray(w)[0]
    np.testing.assert_allclose(np.diag(w), 0.0, atol=1e-7)


@pytest.mark.parametrize("mode", ["max", "last", "max_valid", "last_valid", "mean_valid"])
def test_temporal_aggregate_modes(mode):
    B, T, A, D = 2, 5, 3, 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, A, D))
    valid = jnp.array(
        np.random.RandomState(0).rand(B, T, A) > 0.4
    )
    # ensure at least one valid step per agent
    valid = valid.at[:, 0].set(True)
    agg, v = temporal_aggregate(x, valid, mode)
    assert agg.shape == (B, A, D)
    assert v.shape == (B, A)
    assert np.isfinite(np.asarray(agg)).all()
    xn, vn = np.asarray(x), np.asarray(valid)
    if mode == "max":
        np.testing.assert_allclose(np.asarray(agg), xn.max(axis=1), rtol=1e-6)
    elif mode == "last":
        np.testing.assert_allclose(np.asarray(agg), xn[:, -1], rtol=1e-6)
    elif mode == "max_valid":
        ref = np.where(vn[..., None], xn, -1e3).max(axis=1)
        np.testing.assert_allclose(np.asarray(agg), ref, rtol=1e-6)
    elif mode == "last_valid":
        for b in range(B):
            for a in range(A):
                t = np.nonzero(vn[b, :, a])[0][-1]
                np.testing.assert_allclose(np.asarray(agg)[b, a], xn[b, t, a], rtol=1e-6)
    elif mode == "mean_valid":
        # NOTE: matches the reference exactly — sums over ALL steps (valid
        # masking of x happens upstream), divides by the valid count.
        denom = vn.sum(axis=1)[..., None] + np.finfo(np.float32).eps
        np.testing.assert_allclose(np.asarray(agg), xn.sum(axis=1) / denom, rtol=1e-5)


def test_stacked_gru_invalid_agents_zero_hidden():
    gru = StackedGRU(hidden_dim=8, num_layers=2, dropout=0.0)
    x = jnp.ones((2, 3, 8))
    valid = jnp.array([[True, False, True], [True, True, False]])
    params = gru.init(jax.random.PRNGKey(0), x, valid)
    y, h = gru.apply(params, x, valid)
    y, h = np.asarray(y), np.asarray(h)
    np.testing.assert_allclose(y[~np.asarray(valid)], 0.0)
    np.testing.assert_allclose(h[:, ~np.asarray(valid)], 0.0)
    assert np.abs(y[np.asarray(valid)]).sum() > 0


def test_stacked_gru_sequence_matches_stepwise():
    """Sequence-mode scan must equal stepping one step at a time (SURVEY.md
    section 4, invariant 3: scan vs python-loop equivalence)."""
    gru = StackedGRU(hidden_dim=8, num_layers=2, dropout=0.0)
    B, T, A = 2, 4, 3
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, T, A, 8))
    valid = jnp.ones((B, T, A), dtype=bool)
    params = gru.init(jax.random.PRNGKey(0), x[:, 0], valid[:, 0])
    y_seq, _ = gru.apply(params, x, valid)
    h = None
    ys = []
    for t in range(T):
        y, h = gru.apply(params, x[:, t], valid[:, t], h)
        ys.append(y)
    y_loop = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_seq), np.asarray(y_loop), rtol=1e-5, atol=1e-6)


def test_transformer_block_masks_padded_src():
    blk = TransformerBlock(d_model=16, n_head=2, n_layer=2, dropout_p=0.0)
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    src_pad = jnp.array([[False, False, True, True], [False, True, True, True]])
    params = blk.init(jax.random.PRNGKey(1), src, src_pad)
    out, _ = blk.apply(params, src, src_pad)
    out = np.asarray(out)
    np.testing.assert_allclose(out[np.asarray(src_pad)], 0.0)
    assert np.isfinite(out).all()


def test_transformer_densetnt_variant_no_ffn():
    """d_feedforward <= 0 selects the activation-residual variant
    (ref transformer.py:227-234)."""
    blk = TransformerBlock(d_model=16, n_head=2, n_layer=1, d_feedforward=0, dropout_p=0.0)
    src = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16))
    params = blk.init(jax.random.PRNGKey(1), src)
    out, _ = blk.apply(params, src)
    assert np.isfinite(np.asarray(out)).all()
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = "/".join(str(p) for p, _ in flat)
    assert "linear1" not in names  # no FFN params created


def test_transformer_kv_cache_equivalence():
    """precompute_tgt_kv + cached call must equal the direct tgt path —
    validates the rollout's map K/V hoist (sim/rollout.py)."""
    blk = TransformerBlock(d_model=16, n_head=2, n_layer=3, dropout_p=0.0)
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    src_pad = jnp.zeros((2, 4), dtype=bool)
    tgt_pad = jnp.array([[False] * 6, [False, False, True, True, True, True]])
    params = blk.init(jax.random.PRNGKey(2), src, src_pad, tgt, tgt_pad)
    out_direct, _ = blk.apply(params, src, src_pad, tgt, tgt_pad)
    kv = blk.apply(params, None, tgt=tgt, return_tgt_kv=True)
    assert len(kv) == 3 and all(len(p) == 2 for p in kv)
    out_cached, _ = blk.apply(params, src, src_pad, None, tgt_pad, tgt_kv=kv)
    np.testing.assert_allclose(
        np.asarray(out_direct), np.asarray(out_cached), rtol=1e-6, atol=1e-6
    )
