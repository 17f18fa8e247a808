"""Native C++ metrics engine vs the numpy oracle on randomized cases."""
import numpy as np
import pytest

from trafficbots_tpu.eval.motion_metrics import MotionMetrics, MotionMetricsConfig

native = pytest.importorskip("trafficbots_tpu.eval.native_metrics")


def _random_case(seed, B=2, M=4, K=6, N=1, A=8, TG=91, noise=3.0):
    cfg = MotionMetricsConfig()
    rng = np.random.RandomState(seed)
    TP = 16
    gt = np.zeros((B, A, TG, 7), np.float32)
    gv = rng.rand(B, A, TG) > 0.1
    for b in range(B):
        for a in range(A):
            x0, y0 = rng.uniform(-50, 50, 2)
            th = rng.uniform(-np.pi, np.pi)
            v = rng.uniform(0, 12)
            w = rng.uniform(-0.05, 0.05)
            for t in range(TG):
                gt[b, a, t] = (x0, y0, 4.0, 2.0, th, v * np.cos(th), v * np.sin(th))
                x0 += v * np.cos(th) * 0.1
                y0 += v * np.sin(th) * 0.1
                th += w
    ptr = np.zeros((B, M, K, N, TP, 2), np.float32)
    for b in range(B):
        for m in range(M):
            for k in range(K):
                for n in range(N):
                    g = m  # identity indices
                    for i in range(TP):
                        tt = cfg.pred_to_track_step(i)
                        ptr[b, m, k, n, i] = gt[b, g, tt, :2] + rng.randn(2) * noise * k
    psc = rng.rand(B, M, K).astype(np.float32)
    pgi = np.broadcast_to(np.arange(M, dtype=np.int64)[None, :, None], (B, M, N)).copy()
    pgm = rng.rand(B, M, N) > 0.2
    ot = rng.randint(1, 4, size=(B, A)).astype(np.float32)
    return dict(
        prediction_trajectory=ptr, prediction_score=psc,
        ground_truth_trajectory=gt, ground_truth_is_valid=gv,
        prediction_ground_truth_indices=pgi,
        prediction_ground_truth_indices_mask=pgm, object_type=ot,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy(seed):
    case = _random_case(seed)
    ref = MotionMetrics()
    ref.update(**case)
    ref_out = ref.compute()

    nat = native.NativeMotionMetrics()
    nat.update(**case)
    nat_out = nat.compute()

    for k, v in ref_out.items():
        assert k in nat_out, f"missing {k}"
        np.testing.assert_allclose(nat_out[k], v, rtol=1e-4, atol=1e-5, err_msg=k)


def test_native_multi_batch_accumulation():
    ref = MotionMetrics()
    nat = native.NativeMotionMetrics()
    for seed in (5, 6):
        case = _random_case(seed, B=1)
        ref.update(**case)
        nat.update(**case)
    ref_out = ref.compute()
    nat_out = nat.compute()
    for k, v in ref_out.items():
        np.testing.assert_allclose(nat_out[k], v, rtol=1e-4, atol=1e-5, err_msg=k)
