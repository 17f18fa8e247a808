"""Worker process for the 2-process CPU-mesh distributed test.

Launched by tests/test_multiprocess.py: two of these form a real
`jax.distributed` job (coordinator + client) with 4 virtual CPU devices
each, i.e. an 8-device global mesh spanning process_count() == 2 — the
smallest faithful stand-in for a multi-host TPU slice (SURVEY.md section 4
item 4, section 2.2 last row). It executes the REAL `run.main` fit path:
process-sharded loaders, make_array_from_process_local_data batch
assembly, shard_map DP train steps, the sharded Validator with
WOMDMetrics.sync, and collective Orbax checkpoint saves from every process.
"""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
tmpdir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from trafficbots_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache("cpu")  # share the CPU compile cache with the pytest session
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

import numpy as np  # noqa: E402

# --- direct check of the cross-host WOMD metric-input union -----------------
# RAGGED on purpose: after pad-row filtering the final global batch leaves
# processes with different batch COUNTS and different leading dims (process
# 1 may even hold zero rows) — exactly the shape divergence an array-wise
# allgather would crash on (real WOMD val: len(dataset) % batch_size != 0).
from trafficbots_tpu.eval.womd import WOMDMetrics  # noqa: E402

wm = WOMDMetrics("sync_test", step_gt=90, step_current=10)
assert wm.enabled
if pid == 0:
    wm.engine._batches = [
        {"a": np.full((4, 3), 0.0, np.float32)},
        {"a": np.full((3, 3), 0.5, np.float32)},
    ]
else:
    wm.engine._batches = [{"a": np.full((2, 3), 1.0, np.float32)}]
wm.sync()
rows = [b["a"].shape[0] for b in wm.engine._batches]
assert rows == [4, 3, 2], rows  # union, ordered by process index
assert set(np.unique(np.concatenate([b["a"] for b in wm.engine._batches]))) == {0.0, 0.5, 1.0}
# idempotent: a second sync must not re-gather
wm.sync()
assert [b["a"].shape[0] for b in wm.engine._batches] == [4, 3, 2]

# --- cross-host submission-payload union (ragged per-process lists) ---------
from trafficbots_tpu.eval.submission import SubWOMD  # noqa: E402

sub = SubWOMD(k_futures=2, activate=True)
local_payloads = [b"p0a", b"p0b"] if pid == 0 else [b"p1a"]
for k in sub.scenario_payloads:
    sub.scenario_payloads[k] = list(local_payloads)
sub.sync()
for k in sub.scenario_payloads:
    assert sub.scenario_payloads[k] == [b"p0a", b"p0b", b"p1a"], sub.scenario_payloads[k]
sub.sync()  # idempotent
assert sub.scenario_payloads[1] == [b"p0a", b"p0b", b"p1a"]

# --- the real fit path over the 2-process mesh AT CHALLENGE HORIZON ---------
# n_step stays the default 91 (time_step_current=10 / gt=90 / end=90) so the
# sharded Validator's WOMDMetrics is ENABLED: fit's epoch validation computes
# real WOMD mAP and monitors val/loss = -mAP (ref waymo_motion.py:755-794).
# Only the per-scene entity counts shrink for CPU-mesh speed.
from trafficbots_tpu.run import main  # noqa: E402

TINY = [
    "data.batch_size=8", "data.n_agent=4", "data.n_agent_no_sim=4",
    "data.n_pl=16", "data.n_pl_node=10", "data.n_tl=4", "data.n_tl_stop=4",
    "model.hidden_dim=64", "model.pe_dim=32", "model.tf_cfg.n_head=2",
    "model.tf_cfg.d_feedforward=64", "model.n_layer_tf_as2pl=1",
    "model.n_layer_tf_as2tl=1", "model.latent_encoder.latent_dim=8",
    "model.agent_temporal.num_layers=1", "model.agent_interaction.n_layer=1",
    "model.goal_manager.goal_predictor.n_layer_gru=1",
]

main([
    "action=fit", "synthetic=true", "n_epochs=1", "steps_per_epoch=2",
    "val_batches=1", f"run_dir={tmpdir}/run", "n_video_batch=0",
] + TINY)

# the checkpoint save is a collective: it must have completed on BOTH
# processes (a rank-0-only save would have deadlocked above)
assert os.path.isdir(os.path.join(tmpdir, "run", "ckpt", "last"))
# rank-0 gating of host artifacts: only process 0 writes metrics.jsonl,
# and its val rows must carry the real WOMD mAP (metrics enabled at the
# challenge horizon — NOT the short-horizon fallback val/loss)
metrics_path = os.path.join(tmpdir, "run", "metrics.jsonl")
if pid == 0:
    import json

    assert os.path.exists(metrics_path), "process 0 must write metrics.jsonl"
    val_rows = [
        r for r in map(json.loads, open(metrics_path))
        if "joint_future_pred/mean_average_precision" in r
    ]
    assert val_rows, "fit validation did not compute WOMD mAP under the mesh"
    assert val_rows[-1]["val/loss"] == -val_rows[-1][
        "joint_future_pred/mean_average_precision"
    ], "val/loss must be -mAP when WOMD metrics run"

# --- sharded h5 validate with submissions + pad-row exclusion ---------------
# 12 scenarios / global batch 8 -> the second global batch is padded with 4
# repeat rows (h5_loader._pad_final), and after sharding process 1's slice of
# that batch is ALL pads — the ragged union + pad filtering at its hardest.
import h5py  # noqa: E402

from trafficbots_tpu.config import DataConfig  # noqa: E402
from trafficbots_tpu.data.h5_loader import (  # noqa: E402
    tensor_size_test, tensor_size_train, tensor_size_val,
)
from trafficbots_tpu.data.synthetic import synthetic_episode_batch  # noqa: E402

N_SCENARIO = 12
data_dir = os.path.join(tmpdir, "data")
marker = os.path.join(data_dir, ".ready")
if pid == 0:
    os.makedirs(data_dir, exist_ok=True)
    d = DataConfig(n_agent=4, n_agent_no_sim=4, n_pl=16, n_pl_node=10,
                   n_tl=4, n_tl_stop=4, batch_size=8)
    eps = synthetic_episode_batch(
        d, n_scene=N_SCENARIO, seed=7, with_history=True, with_agent_no_sim=True
    )
    for fname, sizes in (
        ("training", tensor_size_train(d)),
        ("validation", tensor_size_val(d)),
        ("testing", tensor_size_test(d)),
    ):
        with h5py.File(os.path.join(data_dir, f"{fname}.h5"), "w") as hf:
            hf.attrs["data_len"] = N_SCENARIO
            for i in range(N_SCENARIO):
                g = hf.create_group(str(i))
                for k in sizes:
                    g.create_dataset(k, data=eps[k][i])
                g.attrs["scenario_id"] = f"scn{i}"
                g.attrs["scenario_center"] = np.zeros(2, np.float32)
                g.attrs["scenario_yaw"] = 0.0
                g.attrs["with_map"] = True
    open(marker, "w").close()
else:
    import time

    for _ in range(600):
        if os.path.exists(marker):
            break
        time.sleep(0.5)
    assert os.path.exists(marker), "process 0 never finished writing the h5 files"

os.environ["WRITE_SUBMISSIONS"] = "1"
main([
    "action=validate", f"run_dir={tmpdir}/run", "resume=last",
    f"data.data_dir={data_dir}", "n_video_batch=0",
] + TINY)

if pid == 0:
    import tarfile

    # both K=1 (reactive replay) and K=6 (joint future) archives exist and
    # contain EXACTLY the 12 real scenarios — each exactly once: the 4 pad
    # rows were excluded AND the cross-process union dropped nothing
    for method, k in (("trafficbots_tpu_rr", 1), ("trafficbots_tpu_jf", 6)):
        tar_path = os.path.join(
            tmpdir, "run", "submission", f"womd_{method}_K{k}.tar.gz"
        )
        assert os.path.exists(tar_path), f"missing submission archive {tar_path}"
        with tarfile.open(tar_path) as tar:
            names = tar.getnames()
            binname = f"womd_{method}_K{k}/womd_{method}_K{k}.bin"
            assert binname in names, names
            body = tar.extractfile(binname).read()
        # exact per-scenario count: "scn1" also prefixes "scn10"/"scn11"
        counts = {i: body.count(b"scn%d" % i) for i in range(N_SCENARIO)}
        for i in range(10, N_SCENARIO):
            counts[1] -= counts[i]
        assert all(c == 1 for c in counts.values()), (
            f"submission scenario counts wrong (pad rows leaked?): {counts}"
        )
print(f"mp_worker {pid}: OK")
