"""Custom-VJP fused node encoder: forward + hand-derived backward parity.

Validates ops/node_encoder_train.py against jax.grad of the XLA reference
path (FusedNodeEncoder.__call__ + masked max-pool) at dropout_p=0, and the
dropout path by fixed-seed directional finite differences (the masks depend
only on (seed, grid-step, site), not on the inputs, so FD is exact up to
curvature)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbots_tpu.ops.node_encoder import FusedNodeEncoder
from trafficbots_tpu.ops.node_encoder_train import (
    W_NAMES,
    node_encoder_train_pooled,
)

D, H, L, F, N = 16, 2, 3, 16, 5
BP, BLK = 16, 8


def _setup(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    x = jax.random.normal(ks[0], (BP, N, D), jnp.float32)
    valid = jax.random.bernoulli(ks[1], 0.8, (BP, N))
    valid = valid.at[0].set(False)  # one fully-invalid polyline
    valid = valid.at[1].set(True)
    x = jnp.where(valid[..., None], x, 0.0)
    module = FusedNodeEncoder(d_model=D, n_head=H, n_layer=L, d_feedforward=F,
                              dropout_p=0.0)
    params = module.init(jax.random.PRNGKey(1), x, valid)["params"]
    weights = tuple(jnp.asarray(params[n], jnp.float32) for n in W_NAMES)
    return module, params, weights, x, valid


def _xla_loss(module, params, x, valid, g):
    nodes = module.apply({"params": params}, x, valid)
    pooled = jnp.max(jnp.where(valid[..., None], nodes, -1e30), axis=1)
    pooled = jnp.where(jnp.any(valid, axis=-1, keepdims=True), pooled, 0.0)
    return jnp.sum(pooled * g)


def _kernel_loss(weights, x, valid, g, p=0.0, seed=0):
    vf = valid.astype(jnp.float32)[..., None]
    pooled = node_encoder_train_pooled(
        x, vf, weights, jnp.asarray(seed, jnp.int32), L, H, BLK, p,
        jax.default_backend() != "tpu",
    )
    pooled = jnp.where(jnp.any(valid, axis=-1, keepdims=True), pooled, 0.0)
    return jnp.sum(pooled * g)


def test_forward_matches_xla():
    module, params, weights, x, valid = _setup()
    nodes = module.apply({"params": params}, x, valid)
    ref = jnp.max(jnp.where(valid[..., None], nodes, -1e30), axis=1)
    vf = valid.astype(jnp.float32)[..., None]
    got = node_encoder_train_pooled(
        x, vf, weights, jnp.asarray(0, jnp.int32), L, H, BLK, 0.0,
        jax.default_backend() != "tpu",
    )
    vn = np.asarray(jnp.any(valid, axis=-1))
    np.testing.assert_allclose(np.asarray(got)[vn], np.asarray(ref)[vn],
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_autodiff():
    module, params, weights, x, valid = _setup(seed=2)
    g = jax.random.normal(jax.random.PRNGKey(3), (BP, D), jnp.float32)

    # highest matmul precision so the XLA reference's dots are exact f32 on
    # TPU too (default TPU precision routes f32 dots through bf16 passes —
    # the kernel computes exact f32, and the tolerance below is tight)
    with jax.default_matmul_precision("highest"):
        dx_ref = jax.grad(lambda xx: _xla_loss(module, params, xx, valid, g))(x)
        # XLA weight grads (via the param dict)
        dw_ref = jax.grad(
            lambda pp: _xla_loss(module, pp, x, valid, g)
        )({n: params[n] for n in W_NAMES})

        dx, dws = jax.grad(
            lambda xx, ww: _kernel_loss(ww, xx, valid, g), argnums=(0, 1)
        )(x, weights)

    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-4)
    for name, dwk in zip(W_NAMES, dws):
        np.testing.assert_allclose(
            np.asarray(dwk), np.asarray(dw_ref[name]),
            rtol=2e-4, atol=2e-4, err_msg=name,
        )


def test_dropout_backward_vs_exact_mask_oracle():
    """With dropout live, dump the kernels' exact masks (same seeding) and
    compare the hand-derived backward to jax.grad of a pure-jnp reference
    that applies those masks. (FD on the TPU tunnel is swamped by matmul
    rounding noise at loss scale — the exact-mask oracle is the honest
    check; interpret mode lacks the TPU PRNG, so this runs on TPU only.)"""
    from trafficbots_tpu.ops.node_encoder_train import (
        dump_dropout_masks,
        reference_forward_with_masks,
    )

    p, seed = 0.3, 7
    module, params, weights, x, valid = _setup(seed=4)
    g = jax.random.normal(jax.random.PRNGKey(5), (BP, D), jnp.float32)
    vf = valid.astype(jnp.float32)[..., None]
    try:
        masks = dump_dropout_masks(BP, N, D, F, L, H, BLK, p, seed,
                                   interpret=jax.default_backend() != "tpu")
        jax.block_until_ready(masks)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"TPU PRNG unsupported on this backend: {e}")
    # masks are Bernoulli(1-p)/(1-p): values in {0, 1/(1-p)}
    m = np.asarray(masks[0])
    uniq = np.unique(m)
    assert all(np.isclose(u, 0.0) or np.isclose(u, 1 / (1 - p)) for u in uniq), uniq
    keep_rate = (m > 0).mean()
    assert 0.6 < keep_rate < 0.8  # ~1-p

    def ref_loss(xx, ww):
        pooled = reference_forward_with_masks(xx, vf, ww, masks, L, H, BLK)
        pooled = jnp.where(jnp.any(valid, axis=-1, keepdims=True), pooled, 0.0)
        return jnp.sum(pooled * g)

    dx_ref, dws_ref = jax.grad(ref_loss, argnums=(0, 1))(x, weights)
    dx, dws = jax.grad(
        lambda xx, ww: _kernel_loss(ww, xx, valid, g, p=p, seed=seed),
        argnums=(0, 1),
    )(x, weights)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=5e-3, atol=5e-3)
    for name, dwk, dwr in zip(W_NAMES, dws, dws_ref):
        np.testing.assert_allclose(np.asarray(dwk), np.asarray(dwr),
                                   rtol=5e-3, atol=5e-2, err_msg=name)


def test_dropout_deterministic_given_seed():
    try:
        module, params, weights, x, valid = _setup(seed=8)
        g = jnp.ones((BP, D), jnp.float32)
        a = _kernel_loss(weights, x, valid, g, p=0.5, seed=11)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"interpret-mode TPU PRNG unsupported here: {e}")
    b = _kernel_loss(weights, x, valid, g, p=0.5, seed=11)
    c = _kernel_loss(weights, x, valid, g, p=0.5, seed=12)
    assert float(a) == float(b)
    assert float(a) != float(c)


def test_skip_invalid_blocks_grads_identical():
    """A whole kernel block of padding polylines (the fixed 1024-capacity
    tail) takes the skip path in fwd AND bwd; outputs and every gradient
    are identical to the unskipped kernel."""
    module, params, weights, x, valid = _setup(seed=5)
    valid = valid.at[8:].set(False)  # second BLK-8 block entirely padding
    x = jnp.where(valid[..., None], x, 0.0)
    g = jax.random.normal(jax.random.PRNGKey(7), (BP, D), jnp.float32)

    def loss(skip):
        def f(weights, x):
            vf = valid.astype(jnp.float32)[..., None]
            pooled = node_encoder_train_pooled(
                x, vf, weights, jnp.asarray(0, jnp.int32), L, H, BLK, 0.0,
                jax.default_backend() != "tpu", skip,
            )
            pooled = jnp.where(jnp.any(valid, axis=-1, keepdims=True), pooled, 0.0)
            return jnp.sum(pooled * g)
        return f

    v1, (dw1, dx1) = jax.value_and_grad(loss(True), argnums=(0, 1))(weights, x)
    v2, (dw2, dx2) = jax.value_and_grad(loss(False), argnums=(0, 1))(weights, x)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(dx1), np.asarray(dx2))
    for a, b, n in zip(dw1, dw2, W_NAMES):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=n)
    # the skipped block's dx is exactly zero
    np.testing.assert_array_equal(np.asarray(dx1[8:]), 0.0)
