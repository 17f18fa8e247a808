"""Tests for ops/attention_train.py — the custom-VJP fused attention with
in-kernel dropout (training path of models/modules.Attention).

CPU (interpret mode) covers the p=0 forward/backward against the XLA
reference and its autodiff; the dropout paths need the TPU hardware PRNG
and are skipped off-TPU (mirroring tests/test_node_encoder_train.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trafficbots_tpu.ops.attention_train import (
    dump_attn_dropout_masks,
    fused_attention_train,
    fused_attention_train_fits,
)
from trafficbots_tpu.ops.fused_attention import _xla_reference

B, S, T, D, H = 4, 40, 288, 64, 4


def _setup(seed=0, all_invalid_row=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, D), jnp.float32)
    invalid = jax.random.bernoulli(ks[3], 0.3, (B, S, T))
    if all_invalid_row:
        invalid = invalid.at[0, 3].set(True)  # NaN-guard row
    return q, k, v, invalid


def test_forward_matches_xla_reference():
    q, k, v, invalid = _setup(0, all_invalid_row=True)
    with jax.default_matmul_precision("highest"):
        ref = _xla_reference(q, k, v, invalid, H)
        out = fused_attention_train(q, k, v, invalid, jnp.zeros((), jnp.int32), H, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # guard row is exactly zero
    assert np.all(np.asarray(out)[0, 3] == 0.0)


def test_backward_matches_autodiff():
    q, k, v, invalid = _setup(1, all_invalid_row=True)
    g = jax.random.normal(jax.random.PRNGKey(9), (B, S, D), jnp.float32)

    with jax.default_matmul_precision("highest"):
        ref_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(_xla_reference(q_, k_, v_, invalid, H) * g),
            argnums=(0, 1, 2),
        )(q, k, v)
        ker_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(
                fused_attention_train(q_, k_, v_, invalid, jnp.zeros((), jnp.int32), H, 0.0) * g
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
    for name, a, b in zip("qkv", ker_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_fits_gate():
    assert fused_attention_train_fits(32, 64, 1024, 128)  # the as2pl shape
    assert fused_attention_train_fits(32, 1216, 1024, 128)  # latent as2pl (qb path)
    assert not fused_attention_train_fits(1, 8191, 65536, 128)


# query-blocked shape: dense _pick_block must reject it so the qb kernels run
QB_B, QB_S, QB_T, QB_D = 2, 768, 1536, 64


def test_query_blocked_forward_and_backward():
    from trafficbots_tpu.ops.attention_train import _pick_block, _pick_sblock

    assert _pick_block(QB_B, QB_S, QB_T, QB_D) is None
    assert _pick_sblock(QB_S, QB_T, QB_D) is not None

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (QB_B, QB_S, QB_D), jnp.float32)
    k = jax.random.normal(ks[1], (QB_B, QB_T, QB_D), jnp.float32)
    v = jax.random.normal(ks[2], (QB_B, QB_T, QB_D), jnp.float32)
    invalid = jax.random.bernoulli(ks[3], 0.3, (QB_B, QB_S, QB_T))
    invalid = invalid.at[1, 5].set(True)  # NaN-guard row
    g = jax.random.normal(jax.random.PRNGKey(8), (QB_B, QB_S, QB_D), jnp.float32)

    with jax.default_matmul_precision("highest"):
        ref = _xla_reference(q, k, v, invalid, H)
        out = fused_attention_train(q, k, v, invalid, jnp.zeros((), jnp.int32), H, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
        assert np.all(np.asarray(out)[1, 5] == 0.0)

        ref_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(_xla_reference(q_, k_, v_, invalid, H) * g),
            argnums=(0, 1, 2),
        )(q, k, v)
        ker_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(
                fused_attention_train(q_, k_, v_, invalid, jnp.zeros((), jnp.int32), H, 0.0) * g
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
    for name, a, b in zip("qkv", ker_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"qb d{name} mismatch",
        )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU PRNG")
def test_query_blocked_dropout_vs_mask_oracle():
    from trafficbots_tpu.ops.attention_train import dump_attn_dropout_masks_qb

    p = 0.3
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(ks[0], (QB_B, QB_S, QB_D), jnp.float32)
    k = jax.random.normal(ks[1], (QB_B, QB_T, QB_D), jnp.float32)
    v = jax.random.normal(ks[2], (QB_B, QB_T, QB_D), jnp.float32)
    invalid = jax.random.bernoulli(ks[3], 0.3, (QB_B, QB_S, QB_T))
    seed = jnp.asarray(77, jnp.int32)
    masks = dump_attn_dropout_masks_qb(QB_B, QB_S, QB_T, QB_D, H, p, int(seed))

    def oracle(q_, k_, v_):
        d_head = QB_D // H
        qh = q_.reshape(QB_B, QB_S, H, d_head)
        kh = k_.reshape(QB_B, QB_T, H, d_head)
        vh = v_.reshape(QB_B, QB_T, H, d_head)
        logits = jnp.einsum("bshd,bthd->bhst", qh, kh).astype(jnp.float32)
        no_valid = jnp.all(invalid, axis=-1)
        use_mask = invalid & (~no_valid[..., None])
        logits = jnp.where(use_mask[:, None], -jnp.inf, logits)
        attn = jax.nn.softmax(logits / np.sqrt(d_head), axis=-1) * masks
        out = jnp.einsum("bhst,bthd->bshd", attn, vh).reshape(QB_B, QB_S, QB_D)
        return jnp.where(no_valid[..., None], 0.0, out)

    g = jax.random.normal(jax.random.PRNGKey(12), (QB_B, QB_S, QB_D), jnp.float32)
    with jax.default_matmul_precision("highest"):
        np.testing.assert_allclose(
            np.asarray(fused_attention_train(q, k, v, invalid, seed, H, p)),
            np.asarray(oracle(q, k, v)), rtol=2e-4, atol=2e-4)
        ref_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(oracle(q_, k_, v_) * g), argnums=(0, 1, 2)
        )(q, k, v)
        ker_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(
                fused_attention_train(q_, k_, v_, invalid, seed, H, p) * g
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
    for name, a, b in zip("qkv", ker_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"qb d{name} mismatch under dropout",
        )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU PRNG")
def test_dropout_forward_and_backward_vs_mask_oracle():
    p = 0.3
    q, k, v, invalid = _setup(2, all_invalid_row=True)
    seed = jnp.asarray(1234, jnp.int32)
    masks = dump_attn_dropout_masks(B, S, T, H, p, int(seed))  # [B, H, S, T]

    m = np.asarray(masks)
    uniq = np.unique(m)
    assert all(np.isclose(u, 0.0) or np.isclose(u, 1 / (1 - p)) for u in uniq), uniq
    assert 0.6 < (m > 0).mean() < 0.8

    def oracle(q_, k_, v_):
        # XLA forward applying the dumped masks to the softmax weights
        d_head = D // H
        qh = q_.reshape(B, S, H, d_head)
        kh = k_.reshape(B, T, H, d_head)
        vh = v_.reshape(B, T, H, d_head)
        logits = jnp.einsum("bshd,bthd->bhst", qh, kh).astype(jnp.float32)
        no_valid = jnp.all(invalid, axis=-1)
        use_mask = invalid & (~no_valid[..., None])
        logits = jnp.where(use_mask[:, None], -jnp.inf, logits)
        attn = jax.nn.softmax(logits / np.sqrt(d_head), axis=-1) * masks
        out = jnp.einsum("bhst,bthd->bshd", attn, vh).reshape(B, S, D)
        return jnp.where(no_valid[..., None], 0.0, out)

    with jax.default_matmul_precision("highest"):
        ref = oracle(q, k, v)
        out = fused_attention_train(q, k, v, invalid, seed, H, p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

        g = jax.random.normal(jax.random.PRNGKey(5), (B, S, D), jnp.float32)
        ref_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(oracle(q_, k_, v_) * g), argnums=(0, 1, 2)
        )(q, k, v)
        ker_grads = jax.grad(
            lambda q_, k_, v_: jnp.sum(
                fused_attention_train(q_, k_, v_, invalid, seed, H, p) * g
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
    for name, a, b in zip("qkv", ker_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch under dropout",
        )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="module gate is TPU-only")
def test_module_training_path_matches_xla():
    """models/modules.Attention with fused_train at p=0 training equals the
    XLA path bit-for-tolerance (the wiring, not just the op)."""
    from trafficbots_tpu.models.modules import Attention

    q_src = jax.random.normal(jax.random.PRNGKey(0), (B, S, D), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
    pad = jax.random.bernoulli(jax.random.PRNGKey(2), 0.3, (B, T))

    mod_f = Attention(d_model=D, n_head=H, dropout_p=0.0, fused_train=True)
    mod_x = Attention(d_model=D, n_head=H, dropout_p=0.0, fused_train=False, fused=False)
    params = mod_f.init(jax.random.PRNGKey(3), q_src, tgt=tgt, tgt_padding_mask=pad)

    with jax.default_matmul_precision("highest"):
        out_f, _ = mod_f.apply(params, q_src, tgt=tgt, tgt_padding_mask=pad,
                               deterministic=False)
        out_x, _ = mod_x.apply(params, q_src, tgt=tgt, tgt_padding_mask=pad,
                               deterministic=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)


def test_src_invalid_skip_grads_match():
    """Dead query rows (src_invalid): with the caller's downstream zeroing
    in the loss, fwd/bwd of the skipping kernel match the reference exactly
    on both paths (dense and query-blocked)."""
    for (b, s, t, d) in ((4, 40, 288, 64), (1, 1216, 1024, 32)):
        ks = jax.random.split(jax.random.PRNGKey(13), 4)
        q = jax.random.normal(ks[0], (b, s, d), jnp.float32)
        k = jax.random.normal(ks[1], (b, t, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, t, d), jnp.float32)
        invalid = jax.random.bernoulli(ks[3], 0.2, (b, s, t))
        src_invalid = jnp.arange(s)[None, :] >= (s // 4)  # live prefix only

        def loss(fn):
            def f(q, k, v):
                out = fn(q, k, v)
                out = jnp.where(src_invalid[..., None], 0.0, out)
                return jnp.sum(out ** 2)
            return f

        with jax.default_matmul_precision("highest"):
            lf = loss(lambda q, k, v: fused_attention_train(
                q, k, v, invalid, jnp.zeros((), jnp.int32), H, 0.0, src_invalid))
            lr = loss(lambda q, k, v: _xla_reference(q, k, v, invalid, H))
            vf, gf = jax.value_and_grad(lf, argnums=(0, 1, 2))(q, k, v)
            vr, gr = jax.value_and_grad(lr, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
        for a, bb in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=1e-4, atol=2e-5,
                err_msg=f"shape {(b, s, t, d)}",
            )
