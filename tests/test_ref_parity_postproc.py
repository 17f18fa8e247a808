"""Waymo post-processing parity vs the reference (top-k, MTR NMS, MPA NMS).

The k-means EM aggregation path is excluded: docs/divergences.md documents a
conscious delta in empty-cluster handling (off in every default config).
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


def _ref(cfg_kwargs, trajs, scores, valid, atype):
    from data_modules.waymo_post_processing import WaymoPostProcessing

    ref = WaymoPostProcessing(
        k_pred=6, score_temperature=cfg_kwargs.get("score_temperature", -1.0),
        mpa_nms_thresh=cfg_kwargs.get("mpa_nms_thresh", []),
        mtr_nms_thresh=cfg_kwargs.get("mtr_nms_thresh", []),
        aggr_thresh=[], n_iter_em=3, use_ade=cfg_kwargs.get("use_ade", True),
    )
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
        aggr_thresh=(), use_ade=cfg_kwargs.get("use_ade", True),
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
