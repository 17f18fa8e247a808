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


def _assert_engines_agree(cases):
    """Feed the same update stream to both engines; any disagreement is a
    bug in one of them (adversarial differential testing, the in-environment
    mitigation for the unavailable official op — VERDICT round-2 item 7;
    the op config these mirror: ref womd.py:229-262)."""
    ref = MotionMetrics()
    nat = native.NativeMotionMetrics()
    for case in cases:
        ref.update(**case)
        nat.update(**case)
    ref_out = ref.compute()
    nat_out = nat.compute()
    assert set(ref_out) == set(nat_out)
    for k, v in ref_out.items():
        np.testing.assert_allclose(nat_out[k], v, rtol=1e-4, atol=1e-5, err_msg=k)
    return ref_out


def test_exact_score_ties_across_scenarios():
    """All guesses share one score: mAP's sort order is entirely tie-broken.
    Engines must break ties identically (stable by accumulation order)."""
    cases = []
    for seed in (11, 12, 13):
        case = _random_case(seed, B=2)
        case["prediction_score"] = np.full_like(case["prediction_score"], 0.5)
        cases.append(case)
    _assert_engines_agree(cases)


def test_zero_object_buckets():
    """Every agent stationary -> only the STATIONARY bucket has objects;
    the other 7 buckets contribute zero objects to the mAP average."""
    case = _random_case(21, noise=0.5)
    gt = case["ground_truth_trajectory"]
    gt[..., :2] = gt[..., :1, :2]  # freeze positions at t=0
    gt[..., 5:7] = 0.0  # zero velocity
    B, M = case["prediction_score"].shape[:2]
    for b in range(B):
        for m in range(M):
            case["prediction_trajectory"][b, m] = gt[b, m, 0, :2]
    out = _assert_engines_agree([case])
    assert np.isfinite(out["mean_average_precision"])


@pytest.mark.parametrize("speed", [1.4, 11.0, 1.3999999, 11.0000001])
def test_speed_scale_boundary(speed):
    """GT speeds exactly at the 1.4/11.0 clamp bounds of the miss-threshold
    speed scale (scale = 0.5 + 0.5*clamp((v-1.4)/9.6, 0, 1)): both engines
    must clamp identically on either side of the boundary."""
    case = _random_case(31, noise=1.2)
    gt = case["ground_truth_trajectory"]
    # velocity heading aligned with box heading, magnitude = `speed`
    th = gt[..., 4]
    gt[..., 5] = speed * np.cos(th)
    gt[..., 6] = speed * np.sin(th)
    _assert_engines_agree([case])


def test_zero_motion_overlap_heading():
    """Predictions with zero displacement: the overlap check derives box
    heading from the predicted motion direction, which is degenerate
    (atan2(0, 0)) for a frozen trajectory — both engines must fall back the
    same way."""
    case = _random_case(41, noise=0.0)
    ptr = case["prediction_trajectory"]
    ptr[...] = ptr[:, :, :, :, :1, :]  # every guess frozen at its first point
    # place two predicted agents on top of each other to force overlaps
    case["ground_truth_trajectory"][:, 1, :, :2] = case["ground_truth_trajectory"][:, 0, :, :2]
    _assert_engines_agree([case])


@pytest.mark.parametrize("K", [1, 2, 5])
def test_fewer_than_max_predictions(K):
    """K < 6 guesses per object (the op pads to max_predictions=6; a valid
    submission may carry fewer)."""
    case = _random_case(51)
    case["prediction_trajectory"] = case["prediction_trajectory"][:, :, :K]
    case["prediction_score"] = case["prediction_score"][:, :, :K]
    _assert_engines_agree([case])


def test_all_masked_scenario():
    """A scenario whose prediction mask is entirely False contributes no
    records; engines must agree on the resulting averages."""
    good = _random_case(61, B=1)
    empty = _random_case(62, B=1)
    empty["prediction_ground_truth_indices_mask"][:] = False
    _assert_engines_agree([good, empty])


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
