"""Waymo post-processing parity vs the reference (top-k, MTR NMS, MPA NMS,
k-means EM aggregation incl. the empty-cluster largest-split reassignment).
"""
import numpy as np
import pytest

import ref_compat  # noqa: F401

import jax.numpy as jnp
import torch

from ref_compat import t2n

from trafficbots_tpu.config import PostProcessingConfig
from trafficbots_tpu.eval.postprocessing import waymo_post_processing


def _inputs(seed=0, S=2, A=3, P=8, T=16):
    rng = np.random.RandomState(seed)
    trajs = rng.uniform(-20, 20, size=(S, A, P, T, 4)).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, size=(S, A, P)).astype(np.float32)
    valid = rng.rand(S, A) > 0.2
    atype = np.eye(3, dtype=bool)[rng.randint(0, 3, size=(S, A))]
    return trajs, scores, valid, atype


def _clustered_inputs(seed=3, S=2, A=3, P=8, T=16):
    """P modes with EXACT duplicates: the 6 greedy seeds then contain
    duplicated centroids, every mode's argmin-distance tie resolves to the
    FIRST copy (torch CPU min and jnp.argmin agree), so the later copies
    come out of the E-step with zero members — deterministically forcing
    the reference's split-the-largest reassignment
    (waymo_post_processing.py:270-284)."""
    rng = np.random.RandomState(seed)
    trajs = rng.uniform(-50, 50, size=(S, A, P, T, 4)).astype(np.float32)
    trajs[:, :, 1] = trajs[:, :, 0]  # modes 0 == 1 == 2
    trajs[:, :, 2] = trajs[:, :, 0]
    trajs[:, :, 4] = trajs[:, :, 3]  # modes 3 == 4
    scores = rng.uniform(0.05, 1.0, size=(S, A, P)).astype(np.float32)
    valid = np.ones((S, A), bool)
    atype = np.eye(3, dtype=bool)[rng.randint(0, 3, size=(S, A))]
    return trajs, scores, valid, atype


def _ref(cfg_kwargs, trajs, scores, valid, atype):
    from data_modules.waymo_post_processing import WaymoPostProcessing

    ref = WaymoPostProcessing(
        k_pred=6, score_temperature=cfg_kwargs.get("score_temperature", -1.0),
        mpa_nms_thresh=cfg_kwargs.get("mpa_nms_thresh", []),
        mtr_nms_thresh=cfg_kwargs.get("mtr_nms_thresh", []),
        aggr_thresh=[],
        n_iter_em=cfg_kwargs.get("n_iter_em", 3),
        use_ade=cfg_kwargs.get("use_ade", True),
    )
    if cfg_kwargs.get("aggr_thresh"):
        # NOTE: the reference forwards the WHOLE aggr_thresh list into
        # traj_aggr's `thresh: float` (waymo_post_processing.py:53-55) and
        # `tensor < list` raises — the path is uninvocable as shipped with a
        # plain list (__init__ re-lists any sequence, :29). Assigning a
        # length-1 torch tensor post-init satisfies both the len() gate and
        # the broadcast comparison, exposing the intended semantics.
        ref.aggr_thresh = torch.tensor(cfg_kwargs["aggr_thresh"])
    return ref(
        torch.from_numpy(valid), torch.from_numpy(scores.copy()),
        torch.from_numpy(trajs.copy()), torch.from_numpy(atype.astype(np.float32)),
    )


def _ours(cfg_kwargs, trajs, scores, valid, atype):
    cfg = PostProcessingConfig(
        k_pred=6,
        score_temperature=cfg_kwargs.get("score_temperature", -1.0),
        mpa_nms_thresh=tuple(cfg_kwargs.get("mpa_nms_thresh", ())),
        mtr_nms_thresh=tuple(cfg_kwargs.get("mtr_nms_thresh", ())),
        aggr_thresh=tuple(cfg_kwargs.get("aggr_thresh", ())),
        n_iter_em=cfg_kwargs.get("n_iter_em", 3),
        use_ade=cfg_kwargs.get("use_ade", True),
    )
    return waymo_post_processing(
        cfg, jnp.asarray(valid), jnp.asarray(scores), jnp.asarray(trajs),
        jnp.asarray(atype),
    )


def _sorted_by_score(trajs_stepmajor, scores):
    """[S, T, A, K, 2], [S, A, K] -> both sorted descending by score over K
    (the reference's top-k is unsorted; metric consumers are order-invariant)."""
    order = np.argsort(-scores, axis=-1, kind="stable")  # [S, A, K]
    s_sorted = np.take_along_axis(scores, order, axis=-1)
    t_sorted = np.take_along_axis(
        trajs_stepmajor, order[:, None, :, :, None], axis=3
    )
    return t_sorted, s_sorted


@pytest.mark.parametrize(
    "cfg_kwargs",
    [
        dict(),                                           # plain top-k (default)
        dict(score_temperature=1e2),                      # + temperature softmax
        dict(mtr_nms_thresh=[2.5, 1.0, 2.0]),             # MTR greedy NMS
        dict(mtr_nms_thresh=[2.5, 1.0, 2.0], use_ade=False),
        dict(mpa_nms_thresh=[2.5, 1.0, 2.0]),             # MPA score suppression
        dict(aggr_thresh=[2.5]),                          # k-means EM aggregation
        dict(aggr_thresh=[2.5], use_ade=False),
    ],
)
def test_post_processing_parity(cfg_kwargs):
    trajs, scores, valid, atype = _inputs()
    r = _ref(cfg_kwargs, trajs, scores, valid, atype)
    o = _ours(cfg_kwargs, trajs, scores, valid, atype)

    r_trajs, r_scores = t2n(r["waymo_trajs"]), t2n(r["waymo_scores"])
    o_trajs, o_scores = np.asarray(o["waymo_trajs"]), np.asarray(o["waymo_scores"])
    assert o_trajs.shape == r_trajs.shape
    ot, osc = _sorted_by_score(o_trajs, o_scores)
    rt, rsc = _sorted_by_score(r_trajs, r_scores)
    np.testing.assert_allclose(osc, rsc, atol=1e-5)
    np.testing.assert_allclose(ot, rt, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(o["waymo_valid"]), t2n(r["waymo_valid"]))
    if r["waymo_yaw_bbox"] is not None:
        oy, _ = _sorted_by_score(np.asarray(o["waymo_yaw_bbox"]), o_scores)
        ry, _ = _sorted_by_score(t2n(r["waymo_yaw_bbox"]), r_scores)
        np.testing.assert_allclose(oy, ry, atol=1e-5)


def _count_empty_clusters(trajs, scores, k_pred=6, thresh=2.5, n_iter_em=3, use_ade=True):
    """Replay the EM E-steps (with splits applied, like both implementations)
    and count how many (scene, agent, k) cells come out of an E-step empty —
    the self-check that an 'empty cluster' test input really exercises the
    reassignment path."""
    import jax

    from trafficbots_tpu.eval.postprocessing import (
        _pairwise_dist,
        _split_largest_into_empty,
    )

    trajs = jnp.asarray(trajs)
    sc = jnp.asarray(scores / scores.sum(-1, keepdims=True))
    n_pred = sc.shape[-1]
    within = _pairwise_dist(trajs[..., :2], use_ade) < thresh
    idxs = []
    s = sc
    for _ in range(k_pred):
        idx = jnp.argmax(s, axis=-1)
        idxs.append(idx)
        row = jnp.take_along_axis(within, idx[:, :, None, None], axis=2)[:, :, 0]
        s = s * jnp.where(row, 0.1, 1.0)
        s = s - jax.nn.one_hot(idx, n_pred, dtype=s.dtype)
    mode_idx = jnp.stack(idxs, axis=-1)
    trajs_k = jnp.take_along_axis(trajs, mode_idx[:, :, :, None, None], axis=2)
    xy = trajs[..., :2]
    n_empty = 0
    for _ in range(n_iter_em):
        xy_k = trajs_k[..., :2]
        if use_ade:
            dist = jnp.mean(jnp.linalg.norm(xy_k[:, :, None] - xy[:, :, :, None], axis=-1), axis=-1)
        else:
            dist = jnp.linalg.norm(xy_k[:, :, None, :, -1] - xy[:, :, :, None, -1], axis=-1)
        assign = jax.nn.one_hot(jnp.argmin(dist, axis=-1), k_pred)
        n_empty += int(jnp.sum(jnp.sum(assign, axis=2) == 0))
        assign = _split_largest_into_empty(assign, k_pred)
        n_members = jnp.maximum(jnp.sum(assign, axis=2), 1.0)
        trajs_k = (
            jnp.sum(trajs[:, :, :, None] * assign[:, :, :, :, None, None], axis=2)
            / n_members[:, :, :, None, None]
        )
    return n_empty


@pytest.mark.parametrize("use_ade", [True, False])
def test_aggr_empty_cluster_split_parity(use_ade):
    """Tightly clustered modes force E-step-empty centroids; the reference
    splits the largest cluster into them (waymo_post_processing.py:270-284)
    and so must we — bit-matching trajectories and scores."""
    trajs, scores, valid, atype = _clustered_inputs()
    n_empty = _count_empty_clusters(trajs, scores, use_ade=use_ade)
    assert n_empty > 0, "test input failed to force an empty cluster; adjust seed"

    cfg_kwargs = dict(aggr_thresh=[2.5], use_ade=use_ade)
    r = _ref(cfg_kwargs, trajs, scores, valid, atype)
    o = _ours(cfg_kwargs, trajs, scores, valid, atype)
    ot, osc = _sorted_by_score(np.asarray(o["waymo_trajs"]), np.asarray(o["waymo_scores"]))
    rt, rsc = _sorted_by_score(t2n(r["waymo_trajs"]), t2n(r["waymo_scores"]))
    np.testing.assert_allclose(osc, rsc, atol=1e-5)
    np.testing.assert_allclose(ot, rt, atol=1e-4)
