"""WOMD post-processing: K rollout samples -> <=6 scored predictions.

TPU-native redesign of /root/reference/src/data_modules/waymo_post_processing.py.
The reference's MPA-NMS loops over scenes/agents/modes in Python
(waymo_post_processing.py:109-116); here every path (top-k, MTR NMS, k-means
EM aggregation, MPA score suppression) is batched and branchless so the whole
post-processing jits. The sequential greedy structure of the NMS/EM loops is
preserved as a short unrolled loop over k_pred (6 iterations) — sequential in
K but fully vectorized over scenes/agents, which is the TPU-friendly layout.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PostProcessingConfig


def _pairwise_dist(xy: jnp.ndarray, use_ade: bool) -> jnp.ndarray:
    """xy [S, A, P, T, 2] -> [S, A, P, P] mean-ADE or FDE distance."""
    if use_ade:
        d = jnp.linalg.norm(xy[:, :, :, None] - xy[:, :, None, :], axis=-1)
        return jnp.mean(d, axis=-1)
    last = xy[:, :, :, -1]
    return jnp.linalg.norm(last[:, :, :, None] - last[:, :, None, :], axis=-1)


def _type_thresh(agent_type: jnp.ndarray, thresh) -> jnp.ndarray:
    t = jnp.asarray(thresh, dtype=jnp.float32)
    return jnp.einsum("sat,t->sa", agent_type.astype(jnp.float32), t)


def traj_topk(trajs: jnp.ndarray, scores: jnp.ndarray, k_pred: int):
    """Ref waymo_post_processing.py:172-191."""
    _, idx = jax.lax.top_k(scores, k_pred)  # [S, A, k]
    trajs_k = jnp.take_along_axis(trajs, idx[:, :, :, None, None], axis=2)
    scores_k = jnp.take_along_axis(scores, idx, axis=2)
    return trajs_k, scores_k / jnp.sum(scores_k, axis=-1, keepdims=True)


def mtr_nms(trajs, scores, k_pred, type_thresh, use_ade, agent_type):
    """Greedy NMS with 0.01 suppression. Ref waymo_post_processing.py:120-170."""
    thresh = _type_thresh(agent_type, type_thresh)[:, :, None, None]
    within = _pairwise_dist(trajs[..., :2], use_ade) < thresh  # [S, A, P, P]

    sc = scores
    idxs = []
    for _ in range(k_pred):
        idx = jnp.argmax(sc, axis=-1)  # [S, A]
        idxs.append(idx)
        row = jnp.take_along_axis(within, idx[:, :, None, None], axis=2)[:, :, 0]  # [S, A, P]
        w = jnp.where(row, 0.01, 1.0)
        sc = sc * w
        sc = sc - jax.nn.one_hot(idx, sc.shape[-1], dtype=sc.dtype) * (sc.max() + 1.0)
    mode_idx = jnp.stack(idxs, axis=-1)  # [S, A, k]
    trajs_k = jnp.take_along_axis(trajs, mode_idx[:, :, :, None, None], axis=2)
    scores_k = jnp.take_along_axis(scores, mode_idx, axis=2)
    return trajs_k, scores_k / jnp.sum(scores_k, axis=-1, keepdims=True)


def _split_largest_into_empty(assign: jnp.ndarray, k_pred: int) -> jnp.ndarray:
    """Exact empty-cluster reassignment (ref waymo_post_processing.py:270-284):
    for every cluster that came out of the E-step EMPTY, move the FIRST
    floor(n/2) members (pred-index ascending, `[: counter_n // 2]`) of the
    currently-LARGEST cluster (first-max on ties, `.max(0)`) into it.

    The reference's `torch.where(assignment.sum(2) == 0)` iterates the
    originally-empty clusters in (scene, agent, k) row-major order while
    `assignment` mutates. Different (scene, agent) cells never interact, so
    a k-ascending unrolled loop that applies all cells at once is exactly
    that order; splits can neither empty another cluster (the source keeps
    ceil(n/2) >= 1 members) nor fill a later empty one (members move only
    into the specific empty k), so the originally-empty set needs no
    recomputation.
    """
    empty0 = jnp.sum(assign, axis=2) == 0  # [S, A, K] pre-split emptiness
    for k in range(k_pred):
        counts = jnp.sum(assign, axis=2)  # [S, A, K]
        max_i = jnp.argmax(counts, axis=-1)  # [S, A] first max, like torch .max(0)
        n_max = jnp.take_along_axis(counts, max_i[:, :, None], axis=2)  # [S, A, 1]
        member = jnp.take_along_axis(assign, max_i[:, :, None, None], axis=3)[..., 0]  # [S, A, P]
        rank = jnp.cumsum(member, axis=-1)  # 1-based rank among members
        split = (member > 0) & (rank <= jnp.floor(n_max / 2.0))
        do = (empty0[:, :, k][:, :, None] & split)[..., None].astype(assign.dtype)
        one_k = jax.nn.one_hot(jnp.full(max_i.shape, k), k_pred, dtype=assign.dtype)
        one_max = jax.nn.one_hot(max_i, k_pred, dtype=assign.dtype)
        assign = assign + do * (one_k - one_max)[:, :, None, :]
    return assign


def traj_aggr(trajs, scores, k_pred, thresh, n_iter_em, use_ade):
    """Greedy seeding + k-means EM over modes. Ref waymo_post_processing.py:193-295.

    Empty clusters are refilled by splitting the largest cluster exactly as
    the reference does (_split_largest_into_empty). The only remaining
    divergence is the degenerate can't-split case (largest cluster has one
    member, floor(1/2)=0 moves): the reference divides the still-empty
    cluster's sums by zero and emits inf/NaN; here it keeps its previous
    centroid (the safe-divide guard below).
    """
    n_pred = scores.shape[-1]
    within = _pairwise_dist(trajs[..., :2], use_ade) < jnp.asarray(thresh[0], jnp.float32)

    sc = scores
    idxs = []
    for _ in range(k_pred):
        idx = jnp.argmax(sc, axis=-1)
        idxs.append(idx)
        row = jnp.take_along_axis(within, idx[:, :, None, None], axis=2)[:, :, 0]
        sc = sc * jnp.where(row, 0.1, 1.0)
        sc = sc - jax.nn.one_hot(idx, n_pred, dtype=sc.dtype)
    mode_idx = jnp.stack(idxs, axis=-1)
    trajs_k = jnp.take_along_axis(trajs, mode_idx[:, :, :, None, None], axis=2)
    scores_k = jnp.take_along_axis(scores, mode_idx, axis=2)

    xy = trajs[..., :2]
    for _ in range(n_iter_em):
        xy_k = trajs_k[..., :2]
        if use_ade:
            dist = jnp.mean(
                jnp.linalg.norm(xy_k[:, :, None] - xy[:, :, :, None], axis=-1), axis=-1
            )  # [S, A, P, K]
        else:
            dist = jnp.linalg.norm(
                xy_k[:, :, None, :, -1] - xy[:, :, :, None, -1], axis=-1
            )
        assign = jax.nn.one_hot(jnp.argmin(dist, axis=-1), k_pred)  # [S, A, P, K]
        assign = _split_largest_into_empty(assign, k_pred)
        n_members = jnp.sum(assign, axis=2)  # [S, A, K]
        safe = jnp.maximum(n_members, 1.0)
        new_trajs_k = (
            jnp.sum(trajs[:, :, :, None] * assign[:, :, :, :, None, None], axis=2)
            / safe[:, :, :, None, None]
        )
        new_scores_k = jnp.sum(scores[:, :, :, None] * assign, axis=2) / safe
        empty = (n_members == 0)[..., None, None]
        trajs_k = jnp.where(empty, trajs_k, new_trajs_k)
        scores_k = jnp.where(empty[..., 0, 0], scores_k, new_scores_k)

    return trajs_k, scores_k / jnp.sum(scores_k, axis=-1, keepdims=True)


def mpa_nms(valid, trajs, scores, type_thresh, use_ade, agent_type):
    """Score suppression of near-duplicate modes. Ref waymo_post_processing.py:82-118.

    The reference loops modes in descending-score order and sets the score to
    1e-3 when a strictly-better mode is within the distance threshold. That
    is order-independent per mode (the condition only reads the ORIGINAL
    scores), so it vectorizes exactly: suppress mode k iff any mode j with
    score_j > score_k lies within thresh.
    """
    thresh = _type_thresh(agent_type, type_thresh)[:, :, None, None]
    within = _pairwise_dist(trajs[..., :2], use_ade) < thresh  # [S, A, K, K]
    better = scores[:, :, None, :] > scores[:, :, :, None]  # [S, A, K(k), K(j)]
    suppress = jnp.any(within & better, axis=-1)  # [S, A, K]
    suppress = suppress & valid[:, :, None]
    scores = jnp.where(suppress, 1e-3, scores)
    return scores / jnp.sum(scores, axis=-1, keepdims=True)


def waymo_post_processing(
    cfg: PostProcessingConfig,
    valid: jnp.ndarray,  # [S, A]
    scores: jnp.ndarray,  # [S, A, P] unnormalized
    trajs: jnp.ndarray,  # [S, A, P, T, 2..4]
    agent_type: jnp.ndarray,  # [S, A, 3]
) -> Dict[str, Optional[jnp.ndarray]]:
    """Ref waymo_post_processing.py:33-80."""
    scores = scores / jnp.sum(scores, axis=-1, keepdims=True)
    n_pred = trajs.shape[2]
    d_traj = trajs.shape[-1]
    n_step = trajs.shape[3]

    if n_pred > cfg.k_pred:
        if len(cfg.aggr_thresh) > 0:
            trajs, scores = traj_aggr(
                trajs, scores, cfg.k_pred, cfg.aggr_thresh, cfg.n_iter_em, cfg.use_ade
            )
        elif len(cfg.mtr_nms_thresh) > 0:
            trajs, scores = mtr_nms(
                trajs, scores, cfg.k_pred, cfg.mtr_nms_thresh, cfg.use_ade, agent_type
            )
        else:
            trajs, scores = traj_topk(trajs, scores, cfg.k_pred)

    if len(cfg.mpa_nms_thresh) > 0:
        scores = mpa_nms(valid, trajs, scores, cfg.mpa_nms_thresh, cfg.use_ade, agent_type)
    if cfg.score_temperature > 0:
        scores = jax.nn.softmax(
            jnp.log(jnp.maximum(scores, jnp.finfo(scores.dtype).tiny)) / cfg.score_temperature,
            axis=-1,
        )

    trajs = jnp.moveaxis(trajs, 3, 1)  # [S, T, A, K, :]
    return {
        "waymo_trajs": trajs[..., :2],
        "waymo_yaw_bbox": trajs[..., 2:3] if d_traj >= 3 else None,
        "waymo_spd": trajs[..., 3:4] if d_traj >= 4 else None,
        "waymo_scores": scores,
        "waymo_valid": jnp.broadcast_to(valid[:, None], (valid.shape[0], n_step, valid.shape[1])),
    }
