"""Episode-featurization memory-layout fixes (round 5).

Three bit-exactness guarantees behind the batch-256 eval unlock:
  1. The packed pe_xy_yaw PE (one [..., pe_dim] elementwise tensor) equals
     the reference concat-of-six-narrow-pieces formulation bitwise.
  2. InputPeEncoder's cat mode via tail-padded last Dense + PE add equals
     concat([mlp_out, pe]) bitwise (same params).
  3. The chunked episode map encode (orchestration._encode_map_chunked)
     equals the unchunked shared map encoding bitwise.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.tiny import tiny_batch, tiny_config

from trafficbots_tpu import geometry as G
from trafficbots_tpu import orchestration as O
from trafficbots_tpu.data.preprocessing import pre_processing
from trafficbots_tpu.models.modules import MLP, InputPeEncoder


@pytest.mark.parametrize("pe_dim", [32, 96])
def test_pe_xy_yaw_packed_bit_identical(pe_dim):
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.normal(size=(3, 7, 5, 2)).astype(np.float32) * 100.0)
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(3, 7, 5)).astype(np.float32))
    packed = G.pose_pe(xy, yaw[..., None], "pe_xy_yaw", pe_dim)
    reference = jnp.concatenate(
        [
            G.positional_embedding(xy[..., 0], pe_dim // 4, 1e3),
            G.positional_embedding(xy[..., 1], pe_dim // 4, 1e3),
            G.positional_embedding_rad(yaw, pe_dim // 2),
        ],
        axis=-1,
    )
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(reference))


def test_input_pe_cat_fold_matches_concat():
    rng = np.random.default_rng(1)
    hidden, pe_dim = 64, 32
    valid = jnp.asarray(rng.random((2, 5, 4)) > 0.3)
    attr = jnp.asarray(rng.normal(size=(2, 5, 4, 11)).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(2, 5, 4, pe_dim)).astype(np.float32))

    enc = InputPeEncoder(hidden_dim=hidden, pe_dim=pe_dim, mlp_dropout_p=0.0)
    params = enc.init(jax.random.PRNGKey(0), valid, attr, pe)
    folded = enc.apply(params, valid, attr, pe)

    # the pre-fold semantics, reconstructed with the SAME params
    mlp = MLP([hidden - pe_dim] * 2, dropout_p=0.0, end_layer_activation=False)
    mlp_out = mlp.apply({"params": params["params"]["mlp"]}, attr)
    expected = jnp.where(
        valid[..., None], jnp.concatenate([mlp_out, pe], axis=-1), 0.0
    )
    np.testing.assert_array_equal(np.asarray(folded), np.asarray(expected))


def test_mlp_pad_last_to_param_tree_unchanged():
    x = jnp.ones((3, 11))
    padded = MLP([32, 32], dropout_p=0.0, end_layer_activation=False, pad_last_to=128)
    plain = MLP([32, 32], dropout_p=0.0, end_layer_activation=False)
    tp = jax.tree_util.tree_map(
        lambda a: a.shape, padded.init(jax.random.PRNGKey(0), x)
    )
    tn = jax.tree_util.tree_map(
        lambda a: a.shape, plain.init(jax.random.PRNGKey(0), x)
    )
    assert tp == tn
    out = padded.apply(plain.init(jax.random.PRNGKey(0), x), x)
    ref = plain.apply(plain.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_array_equal(np.asarray(out[..., :32]), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(out[..., 32:]), 0.0)


def test_chunked_map_encode_matches_unchunked():
    cfg = tiny_config()
    n_scene = 4
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(cfg, n_scene=n_scene).items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)
    pbatch = pre_processing(batch, cfg.model, training=False)

    cfg_chunk = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, map_encode_chunk=2)
    )
    model_chunk = O.make_model(cfg_chunk)
    feats_chunk = O.encode_episode_features(
        model_chunk, params, pbatch, training=False, key=None
    )

    cfg_plain = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, map_encode_chunk=0)
    )
    model_plain = O.make_model(cfg_plain)
    feats_plain = O.encode_episode_features(
        model_plain, params, pbatch, training=False, key=None
    )

    # bit-identical on TPU (per-row MXU accumulation is independent of the
    # batch partitioning — verified on hardware); CPU XLA re-blocks matmuls
    # by batch shape and reassociates at the ~1e-6 level
    for view in feats_plain:
        for k in feats_plain[view]:
            np.testing.assert_allclose(
                np.asarray(feats_chunk[view][k]),
                np.asarray(feats_plain[view][k]),
                atol=1e-5,
                rtol=1e-5,
                err_msg=f"{view}/{k}",
            )


def _chunk_call_recorder(monkeypatch):
    calls = []
    real = O._encode_map_chunked

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(O, "_encode_map_chunked", spy)
    return calls


def test_allow_map_chunk_flag_gates_chunked_path(monkeypatch):
    """allow_map_chunk=False must keep validation off the lax.map chunk path
    (eval_shape traces the Python gate without compiling anything)."""
    from trafficbots_tpu.evaluation_loop import validation_device_step

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, map_encode_chunk=2))
    n_scene = 8  # > chunk and divisible by it: the batch-shape gate fires
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(cfg, n_scene=n_scene).items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), batch)

    calls = _chunk_call_recorder(monkeypatch)
    key = jax.random.PRNGKey(1)
    jax.eval_shape(
        lambda p, b, k: validation_device_step(cfg, model, p, b, k, allow_map_chunk=True),
        params, batch, key,
    )
    assert calls, "chunk gate should fire at batch 8 / chunk 2 when allowed"

    calls.clear()
    jax.eval_shape(
        lambda p, b, k: validation_device_step(cfg, model, p, b, k, allow_map_chunk=False),
        params, batch, key,
    )
    assert not calls, "allow_map_chunk=False must bypass the chunked encode"


def test_mesh_validator_never_chunks_map_encode(monkeypatch):
    """A mesh-sharded Validator must not take the chunked map-encode path:
    inside its GSPMD-jitted step the scene axis is GLOBAL, so lax.map over
    global sub-batches would serialize the data-parallel map encode and
    reshard every chunk across devices (the HBM cap the chunk exists for is
    per-device anyway)."""
    from jax.sharding import Mesh
    from trafficbots_tpu.evaluation_loop import Validator

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, map_encode_chunk=2))
    n_scene = 8  # global batch: would satisfy the chunk gate if not meshed
    batch = tiny_batch(cfg, n_scene=n_scene)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    model, params = O.init_params(cfg, jax.random.PRNGKey(0), jbatch)

    calls = _chunk_call_recorder(monkeypatch)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    v = Validator(cfg, model, use_native_metrics=False, mesh=mesh)
    v.step(params, batch, jax.random.PRNGKey(1))
    assert not calls, "meshed Validator must disable the chunked map encode"
    out = v.epoch_end()
    assert np.isfinite(out["val/loss"])
