"""DestPredictor head modes + type-mask semantics (ref goal_manager.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbots_tpu.config import TransformerConfig
from trafficbots_tpu.models.goal_manager import DestPredictor, _dest_type_masks


S, T, A, P, D = 2, 6, 3, 10, 16


def _inputs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    agent_type = jax.nn.one_hot(
        jax.random.randint(ks[0], (S, A), 0, 3), 3
    ).astype(bool)
    # map types: mix of lanes (0..3), edges (4..5), others; pin two road
    # edges (type 4) so every agent type has at least one eligible polyline
    # (otherwise the flat-logits fallback legitimately spreads mass anywhere)
    mt_idx = jax.random.randint(ks[1], (S, P), 0, 11)
    mt_idx = mt_idx.at[:, :2].set(4)
    map_type = jax.nn.one_hot(mt_idx, 11).astype(bool)
    agent_state = jax.random.normal(ks[2], (S, T, A, 4))
    agent_feature = jax.random.normal(ks[3], (S, T, A, D))
    agent_feature_valid = jnp.ones((S, T, A), bool)
    map_feature = jax.random.normal(ks[0], (S, P, D))
    map_feature_valid = jnp.ones((S, P), bool)
    return dict(
        agent_type=agent_type, map_type=map_type, agent_state=agent_state,
        agent_feature=agent_feature, agent_feature_valid=agent_feature_valid,
        map_feature=map_feature, map_feature_valid=map_feature_valid,
    )


@pytest.mark.parametrize("mode", ["mlp", "attn", "transformer", "transformer_aggr"])
def test_dest_predictor_modes(mode):
    """All four head modes (ref goal_manager.py:233-333) produce a valid
    categorical over polylines with per-type exclusions applied."""
    inp = _inputs()
    dp = DestPredictor(
        tf_cfg=TransformerConfig(d_model=D, n_head=2, d_feedforward=D, dropout_p=0.0),
        mode=mode, n_layer_gru=1,
    )
    params = dp.init(jax.random.PRNGKey(1), **inp)
    dist = dp.apply(params, **inp)
    logits = np.asarray(dist.logits)
    assert logits.shape == (S, A, P)
    assert np.isfinite(np.exp(logits)).all()
    probs = np.exp(logits)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    # type exclusions: vehicles must place zero mass on bike lanes (type 3),
    # pedestrians zero on any lane (types 0..3), cyclists zero on car lanes
    # (types 0..2); everyone zero on non-lane polylines (types 5..10 minus
    # road edges allowed? ref masks everything that is not a lane 0..4)
    mt = np.asarray(inp["map_type"]).argmax(-1)
    at = np.asarray(inp["agent_type"]).argmax(-1)
    for s in range(S):
        for a in range(A):
            if at[s, a] == 0:  # vehicle
                assert probs[s, a][mt[s] == 3].sum() < 1e-6
            elif at[s, a] == 1:  # pedestrian
                assert probs[s, a][np.isin(mt[s], [0, 1, 2, 3])].sum() < 1e-6
            else:  # cyclist
                assert probs[s, a][np.isin(mt[s], [0, 1, 2])].sum() < 1e-6


def test_dest_type_masks_all_excluded_rows_get_flat_logits():
    """Agents whose every polyline is excluded get a flat (uniform)
    distribution, not NaN (ref goal_manager.py:329-332)."""
    inp = _inputs(seed=2)
    # scene of only bike lanes (type 3) -> pedestrians exclude everything
    inp["map_type"] = jnp.broadcast_to(
        jax.nn.one_hot(jnp.full((P,), 3), 11).astype(bool)[None], (S, P, 11)
    )
    inp["agent_type"] = jnp.broadcast_to(
        jnp.asarray([False, True, False])[None, None], (S, A, 3)
    )
    dp = DestPredictor(
        tf_cfg=TransformerConfig(d_model=D, n_head=2, d_feedforward=D, dropout_p=0.0),
        mode="mlp", n_layer_gru=0,
    )
    params = dp.init(jax.random.PRNGKey(1), **inp)
    dist = dp.apply(params, **inp)
    probs = np.exp(np.asarray(dist.logits))
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs, 1.0 / P, rtol=1e-5)
