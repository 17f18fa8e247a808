"""WOMD metric-input packing parity vs the reference's WOMDMetrics.update.

The packer turns rollout buffers into the official op's input layout
(marginal m_joint=8 / interactive n_pred=2, 10->2 Hz downsampling,
predict-agents-first reordering). Both packers consume the same batch and
rollout; every op-input tensor must match elementwise.
"""
import sys
import types

import numpy as np
import pytest

import ref_compat  # noqa: F401

import torch

from ref_compat import t2n


def _install_waymo_stub():
    """Minimal waymo_open_dataset stub so the reference womd.py imports; the
    packing logic under test never touches the op. Marked _is_stub so the
    official-op cross-validation test still skips correctly."""
    if "waymo_open_dataset" in sys.modules:
        return
    wod = types.ModuleType("waymo_open_dataset")
    wod._is_stub = True
    protos = types.ModuleType("waymo_open_dataset.protos")
    mmpb = types.ModuleType("waymo_open_dataset.protos.motion_metrics_pb2")

    class MotionMetricsConfig:
        def SerializeToString(self):
            return b""

    mmpb.MotionMetricsConfig = MotionMetricsConfig
    protos.motion_metrics_pb2 = mmpb
    metrics = types.ModuleType("waymo_open_dataset.metrics")
    ops = types.ModuleType("waymo_open_dataset.metrics.ops")
    pmo = types.ModuleType("waymo_open_dataset.metrics.ops.py_metrics_ops")
    pmo.motion_metrics = None
    ops.py_metrics_ops = pmo
    pyd = types.ModuleType("waymo_open_dataset.metrics.python")
    cup = types.ModuleType("waymo_open_dataset.metrics.python.config_util_py")
    cup.get_breakdown_names_from_motion_config = lambda cfg: []
    pyd.config_util_py = cup
    metrics.ops = ops
    metrics.python = pyd
    wod.protos = protos
    wod.metrics = metrics
    for name, mod in (
        ("waymo_open_dataset", wod),
        ("waymo_open_dataset.protos", protos),
        ("waymo_open_dataset.protos.motion_metrics_pb2", mmpb),
        ("waymo_open_dataset.metrics", metrics),
        ("waymo_open_dataset.metrics.ops", ops),
        ("waymo_open_dataset.metrics.ops.py_metrics_ops", pmo),
        ("waymo_open_dataset.metrics.python", pyd),
        ("waymo_open_dataset.metrics.python.config_util_py", cup),
    ):
        sys.modules[name] = mod


_install_waymo_stub()

from trafficbots_tpu.config import DataConfig
from trafficbots_tpu.data.synthetic import synthetic_episode_batch
from trafficbots_tpu.eval.womd import WOMDMetrics


class _CaptureEngine:
    def __init__(self):
        self.inputs = None

    def reset(self):
        self.inputs = None

    def update(self, **kwargs):
        self.inputs = {k: np.asarray(v) for k, v in kwargs.items()}


@pytest.mark.parametrize("interactive", [False, True])
@pytest.mark.parametrize("with_score", [True, False])
def test_womd_packing_parity(interactive, with_score):
    from models.metrics.womd import WOMDMetrics as RefWOMD

    # bypass the proto-based config construction (stubbed); only the
    # packing in update() is under test
    RefWOMD._waymo_metrics_config_names = staticmethod(
        lambda hist, fut: (sys.modules[
            "waymo_open_dataset.protos.motion_metrics_pb2"
        ].MotionMetricsConfig(), [])
    )

    data = DataConfig(n_step=91, n_agent=8, n_agent_no_sim=8,
                      n_pl=16, n_pl_node=10, n_tl=6, n_tl_stop=6)
    rng = np.random.RandomState(31)
    b = synthetic_episode_batch(data, n_scene=2, seed=8)
    # give each scene predict-role agents (role[..., 2]) in scattered slots
    b["agent/role"][:] = False
    b["agent/role"][0, [1, 4], 2] = True
    b["agent/role"][1, [0, 2, 5], 2] = True
    K = 6 if not interactive else 6
    pred_traj = rng.randn(2, 90, data.n_agent, K, 2).astype(np.float32)
    pred_score = None
    if with_score:
        ps = rng.rand(2, data.n_agent, K).astype(np.float32)
        pred_score = ps / ps.sum(-1, keepdims=True)
    if interactive:
        # interactive challenge evaluates exactly 2 predict agents per scene
        b["agent/role"][:] = False
        b["agent/role"][0, [1, 4], 2] = True
        b["agent/role"][1, [0, 5], 2] = True

    ref = RefWOMD("p", step_gt=90, step_current=10, interactive_challenge=interactive)
    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()
          if isinstance(v, np.ndarray)}
    ref.update(tb, torch.from_numpy(pred_traj),
               None if pred_score is None else torch.from_numpy(pred_score))

    ours = WOMDMetrics("p", step_gt=90, step_current=10,
                       interactive_challenge=interactive, use_native=False)
    ours.engine = _CaptureEngine()
    ours.update(b, pred_traj, pred_score)
    got = ours.engine.inputs

    ref_inputs = {
        "prediction_trajectory": ref.prediction_trajectory_gpu[0],
        "prediction_score": ref.prediction_score_gpu[0],
        "ground_truth_trajectory": ref.ground_truth_trajectory_gpu[0],
        "ground_truth_is_valid": ref.ground_truth_is_valid_gpu[0],
        "prediction_ground_truth_indices_mask": ref.prediction_ground_truth_indices_mask_gpu[0],
        "object_type": ref.object_type_gpu[0],
    }
    for k, rv in ref_inputs.items():
        rvn = t2n(rv)
        assert got[k].shape == rvn.shape, f"{k}: {got[k].shape} vs {rvn.shape}"
        np.testing.assert_allclose(got[k].astype(np.float32), rvn.astype(np.float32),
                                   atol=1e-6, err_msg=k)
    # the indices our packer feeds must match the reference's compute()-time
    # expansion (womd.py:184-190)
    if interactive:
        expected = np.broadcast_to(np.arange(2, dtype=np.int64)[None, None, :], got[
            "prediction_ground_truth_indices"].shape)
    else:
        expected = np.broadcast_to(np.arange(8, dtype=np.int64)[None, :, None], got[
            "prediction_ground_truth_indices"].shape)
    np.testing.assert_array_equal(got["prediction_ground_truth_indices"], expected)
