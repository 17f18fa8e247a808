"""Cross-validation of our motion-metrics engines against Waymo's official
C++ TF op (`py_metrics_ops.motion_metrics`).

The op is the ground truth the reference evaluates with
(/root/reference/src/models/metrics/womd.py:176-227). The waymo_open_dataset
package is NOT installed in the build environment, so these tests skip there
— in any environment that has it (e.g. a real WOMD eval host) they run
automatically and pin our numpy engine (and transitively the C++ engine,
which is equality-tested against numpy in test_native_metrics.py) to the
official op's numbers.
"""
import numpy as np
import pytest

wod = pytest.importorskip("waymo_open_dataset")
if getattr(wod, "_is_stub", False):  # installed by test_ref_parity_womd.py
    pytest.skip("waymo_open_dataset is a test stub", allow_module_level=True)

import tensorflow as tf  # noqa: E402
from google.protobuf import text_format  # noqa: E402
from waymo_open_dataset.metrics.ops import py_metrics_ops  # noqa: E402
from waymo_open_dataset.metrics.python import config_util_py  # noqa: E402
from waymo_open_dataset.protos import motion_metrics_pb2  # noqa: E402

from trafficbots_tpu.eval.motion_metrics import MotionMetrics  # noqa: E402

# import the randomized case builder from the C++-vs-numpy test
from test_native_metrics import _random_case  # noqa: E402


def _official_config():
    """Mirrors /root/reference/src/models/metrics/womd.py:232-262."""
    config = motion_metrics_pb2.MotionMetricsConfig()
    text_format.Parse(
        """
        track_steps_per_second: 10
        prediction_steps_per_second: 2
        track_history_samples: 10
        track_future_samples: 80
        speed_lower_bound: 1.4
        speed_upper_bound: 11.0
        speed_scale_lower: 0.5
        speed_scale_upper: 1.0
        max_predictions: 6
        step_configurations {
          measurement_step: 5
          lateral_miss_threshold: 1.0
          longitudinal_miss_threshold: 2.0
        }
        step_configurations {
          measurement_step: 9
          lateral_miss_threshold: 1.8
          longitudinal_miss_threshold: 3.6
        }
        step_configurations {
          measurement_step: 15
          lateral_miss_threshold: 3.0
          longitudinal_miss_threshold: 6.0
        }
        """,
        config,
    )
    return config


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_numpy_engine_matches_official_op(seed):
    case = _random_case(seed)
    config = _official_config()
    names = config_util_py.get_breakdown_names_from_motion_config(config)

    values = py_metrics_ops.motion_metrics(
        config=config.SerializeToString(),
        prediction_trajectory=tf.convert_to_tensor(case["prediction_trajectory"]),
        prediction_score=tf.convert_to_tensor(case["prediction_score"]),
        ground_truth_trajectory=tf.convert_to_tensor(case["ground_truth_trajectory"]),
        ground_truth_is_valid=tf.convert_to_tensor(case["ground_truth_is_valid"]),
        prediction_ground_truth_indices=tf.convert_to_tensor(
            case["prediction_ground_truth_indices"]
        ),
        prediction_ground_truth_indices_mask=tf.convert_to_tensor(
            case["prediction_ground_truth_indices_mask"]
        ),
        object_type=tf.convert_to_tensor(case["object_type"]),
    )

    ours = MotionMetrics()
    ours.update(**case)
    out = ours.compute()

    for m_type in ("min_ade", "min_fde", "miss_rate", "overlap_rate", "mean_average_precision"):
        official = np.asarray(getattr(values, m_type))
        for i, name in enumerate(names):
            np.testing.assert_allclose(
                out[f"{m_type}/{name}"], official[i], rtol=1e-3, atol=1e-4,
                err_msg=f"{m_type}/{name}",
            )
