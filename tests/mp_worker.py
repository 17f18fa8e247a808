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

# --- the real fit path over the 2-process mesh ------------------------------
from trafficbots_tpu.run import main  # noqa: E402

main([
    "action=fit", "synthetic=true", "n_epochs=1", "steps_per_epoch=2",
    "val_batches=1", f"run_dir={tmpdir}/run", "n_video_batch=0",
    # tiny dims (tests/tiny.py scale) so two CPU processes finish quickly
    "data.batch_size=8", "data.n_step=16", "data.n_step_history=6",
    "data.n_agent=4", "data.n_agent_no_sim=8", "data.n_pl=16",
    "data.n_pl_node=10", "data.n_tl=6", "data.n_tl_stop=6",
    "time_step_current=5", "time_step_end=15", "time_step_gt=15",
    "model.hidden_dim=64", "model.pe_dim=32", "model.tf_cfg.n_head=2",
    "model.tf_cfg.d_feedforward=64", "model.n_layer_tf_as2pl=1",
    "model.n_layer_tf_as2tl=1", "model.latent_encoder.latent_dim=8",
    "model.agent_temporal.num_layers=1", "model.agent_interaction.n_layer=1",
    "model.goal_manager.goal_predictor.n_layer_gru=1",
])

# the checkpoint save is a collective: it must have completed on BOTH
# processes (a rank-0-only save would have deadlocked above)
assert os.path.isdir(os.path.join(tmpdir, "run", "ckpt", "last"))
# rank-0 gating of host artifacts: only process 0 writes metrics.jsonl
metrics_exists = os.path.exists(os.path.join(tmpdir, "run", "metrics.jsonl"))
if pid == 0:
    assert metrics_exists, "process 0 must write metrics.jsonl"
print(f"mp_worker {pid}: OK")
