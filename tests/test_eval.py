"""Tests for post-processing and the WOMD motion-metrics engine."""
import numpy as np
import jax.numpy as jnp

from trafficbots_tpu.config import PostProcessingConfig
from trafficbots_tpu.eval.postprocessing import waymo_post_processing, traj_topk, mpa_nms
from trafficbots_tpu.eval.motion_metrics import (
    MotionMetrics,
    MotionMetricsConfig,
    classify_trajectory,
)
from trafficbots_tpu.eval.womd import WOMDMetrics


def _mk_preds(S=1, A=2, P=8, T=16, seed=0):
    rng = np.random.RandomState(seed)
    trajs = rng.uniform(-10, 10, size=(S, A, P, T, 2)).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, size=(S, A, P)).astype(np.float32)
    return jnp.asarray(trajs), jnp.asarray(scores)


def test_topk_selects_best():
    trajs, scores = _mk_preds()
    tk, sk = traj_topk(trajs, scores, 6)
    assert tk.shape == (1, 2, 6, 16, 2)
    # the selected (unnormalized) scores are the 6 largest
    top6 = np.sort(np.asarray(scores), axis=-1)[:, :, -6:]
    sel = np.asarray(sk) * top6.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.sort(sel, axis=-1), top6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sk).sum(-1), 1.0, rtol=1e-5)


def test_post_processing_default_topk():
    cfg = PostProcessingConfig()
    trajs, scores = _mk_preds(P=8)
    valid = jnp.ones((1, 2), dtype=bool)
    agent_type = jnp.asarray(np.tile([True, False, False], (1, 2, 1)))
    out = waymo_post_processing(cfg, valid, scores, trajs, agent_type)
    assert out["waymo_trajs"].shape == (1, 16, 2, 6, 2)
    assert out["waymo_scores"].shape == (1, 2, 6)
    np.testing.assert_allclose(np.asarray(out["waymo_scores"]).sum(-1), 1.0, rtol=1e-5)
    assert out["waymo_valid"].shape == (1, 16, 2)


def test_post_processing_nms_and_aggr_paths():
    trajs, scores = _mk_preds(P=8)
    valid = jnp.ones((1, 2), dtype=bool)
    agent_type = jnp.asarray(np.tile([True, False, False], (1, 2, 1)))
    for cfg in (
        PostProcessingConfig(mtr_nms_thresh=(2.5, 1.0, 2.0)),
        PostProcessingConfig(aggr_thresh=(2.5,)),
        PostProcessingConfig(mpa_nms_thresh=(2.5, 1.0, 2.0)),
    ):
        out = waymo_post_processing(cfg, valid, scores, trajs, agent_type)
        sc = np.asarray(out["waymo_scores"])
        assert np.isfinite(sc).all()
        np.testing.assert_allclose(sc.sum(-1), 1.0, rtol=1e-4)


def test_classify_trajectory():
    T = 81
    valid = np.ones(T, dtype=bool)
    t = np.linspace(0, 8, T)
    # stationary
    pos = np.zeros((T, 2)); yaw = np.zeros(T); spd = np.zeros(T)
    assert classify_trajectory(valid, pos, yaw, spd) == 0
    # straight at 10 m/s
    pos = np.stack([10 * t, np.zeros(T)], -1); spd = np.full(T, 10.0)
    assert classify_trajectory(valid, pos, yaw, spd) == 1
    # left turn: heading +90deg, lateral displacement positive
    yaw_t = np.linspace(0, np.pi / 2, T)
    pos = np.stack([20 * np.sin(yaw_t), 20 * (1 - np.cos(yaw_t))], -1)
    assert classify_trajectory(valid, pos, yaw_t, spd) == 5
    # right turn
    assert classify_trajectory(valid, pos * np.array([1, -1]), -yaw_t, spd) == 7


def _perfect_case(n_agent=1, K=3, noise=0.0, seed=0):
    """One scene where guess 0 exactly matches a straight GT track."""
    cfg = MotionMetricsConfig()
    rng = np.random.RandomState(seed)
    TG = 91
    A = n_agent
    gt = np.zeros((1, A, TG, 7), np.float32)
    for a in range(A):
        gt[0, a, :, 0] = np.arange(TG) * 1.0 + 100 * a  # x moves 10 m/s
        gt[0, a, :, 1] = 100 * a
        gt[0, a, :, 2] = 4.0
        gt[0, a, :, 3] = 2.0
        gt[0, a, :, 4] = 0.0
        gt[0, a, :, 5] = 10.0
    gtv = np.ones((1, A, TG), bool)
    TP = 16
    ptr = np.zeros((1, A, K, 1, TP, 2), np.float32)
    for a in range(A):
        for k in range(K):
            for i in range(TP):
                tt = cfg.pred_to_track_step(i)
                off = 0.0 if k == 0 else 50.0 * k  # guess 0 perfect, others far
                ptr[0, a, k, 0, i] = gt[0, a, tt, :2] + off + noise * rng.randn(2)
    psc = np.tile(np.linspace(1.0, 0.1, K, dtype=np.float32), (1, A, 1))
    pgi = np.broadcast_to(np.arange(A, dtype=np.int64)[None, :, None], (1, A, 1)).copy()
    pgim = np.ones((1, A, 1), bool)
    ot = np.ones((1, A), np.float32)  # vehicles
    return dict(
        prediction_trajectory=ptr, prediction_score=psc,
        ground_truth_trajectory=gt, ground_truth_is_valid=gtv,
        prediction_ground_truth_indices=pgi,
        prediction_ground_truth_indices_mask=pgim, object_type=ot,
    )


def test_motion_metrics_perfect_prediction():
    mm = MotionMetrics()
    mm.update(**_perfect_case())
    out = mm.compute()
    assert out["min_ade"] == 0.0
    assert out["min_fde"] == 0.0
    assert out["miss_rate"] == 0.0
    assert out["overlap_rate"] == 0.0
    # vehicle breakdowns populated; ped/cyc empty -> 0
    assert out["min_ade/TYPE_VEHICLE"] == 0.0
    assert out["mean_average_precision/TYPE_VEHICLE"] > 0.99


def test_motion_metrics_bad_prediction_misses():
    mm = MotionMetrics()
    case = _perfect_case()
    case["prediction_trajectory"] = case["prediction_trajectory"] + 100.0
    mm.update(**case)
    out = mm.compute()
    assert out["miss_rate/TYPE_VEHICLE"] == 1.0
    assert out["min_ade/TYPE_VEHICLE"] > 50.0
    assert out["mean_average_precision/TYPE_VEHICLE"] == 0.0


def test_soft_map_ignores_duplicate_matches():
    """All K guesses match the single GT: hard mAP counts the extra matches
    as FPs, Soft mAP skips them (ref Waymo op soft-match semantics)."""
    mm = MotionMetrics()
    case = _perfect_case(n_agent=2, K=3)
    # make every guess a perfect match (not just guess 0), and order scores
    # so agent 0's duplicate matches rank between the two groups' TPs:
    # hard mAP counts them as FPs at recall 0.5, soft mAP skips them
    ptr = case["prediction_trajectory"]
    case["prediction_trajectory"] = np.repeat(ptr[:, :, :1], 3, axis=2)
    case["prediction_score"] = np.array(
        [[[1.0, 0.9, 0.8], [0.5, 0.4, 0.3]]], np.float32
    )
    mm.update(**case)
    out = mm.compute()
    assert out["soft_mean_average_precision/TYPE_VEHICLE"] > 0.99
    assert (
        out["soft_mean_average_precision/TYPE_VEHICLE"]
        > out["mean_average_precision/TYPE_VEHICLE"]
    )


def test_motion_metrics_noise_ordering():
    """More noise -> worse ADE."""
    outs = []
    for noise in (0.1, 2.0):
        mm = MotionMetrics()
        mm.update(**_perfect_case(noise=noise))
        outs.append(mm.compute()["min_ade"])
    assert outs[0] < outs[1]


def test_womd_metrics_packing():
    """End-to-end: packer + engine on a GT-replay prediction."""
    from tiny import tiny_config
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.config import DataConfig

    data = DataConfig(n_agent=8, n_pl=16, n_pl_node=10, n_tl=6, n_tl_stop=6)
    batch = synthetic_episode_batch(data, n_scene=2, seed=3)
    wm = WOMDMetrics("reactive_replay", use_native=False)

    # prediction = GT future (steps 11..90), K=1
    gt_pos = batch["agent/pos"]  # [B, T, A, 2]
    pred = gt_pos[:, 11:91][:, :, :, None, :]  # [B, 80, A, 1, 2]
    wm.update(batch, pred, None)
    out = wm.compute()
    assert out["reactive_replay/min_ade"] < 1e-4
    assert out["reactive_replay/miss_rate"] == 0.0
    assert "reactive_replay/mean_average_precision" in out
