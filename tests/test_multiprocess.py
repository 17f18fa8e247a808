"""2-process jax.distributed CPU-mesh test for the multi-host claims.

Spawns two real OS processes (tests/mp_worker.py) that form a
`jax.distributed` job — 4 virtual CPU devices each, 8 global — and run the
actual `run.main` fit: process-sharded loaders, global-batch assembly via
`jax.make_array_from_process_local_data`, shard_map DP training, the
sharded Validator (local-rows WOMD packing + cross-host sync), and
collective Orbax checkpointing from every process. This executes the
code paths that single-process dryruns cannot (process_count() > 1), per
SURVEY.md section 2.2 (ref womd.py:44-49 dist_sync, waymo_motion.py:951-953
rank-0 gating).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fit(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # each worker sets its own JAX_PLATFORMS/XLA_FLAGS; scrub the pytest
    # session's 8-device override so workers get exactly 4 local devices
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2700)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process fit timed out (possible collective deadlock)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"mp_worker {pid}: OK" in out

    # collective checkpoint completed; rank-0 host artifacts exist
    assert (tmp_path / "run" / "ckpt" / "last").is_dir()
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    # the sharded h5 validate wrote both submission archives (rank-0-only;
    # the worker itself asserts the exact 12-scenario content with the 4
    # pad rows excluded)
    assert (tmp_path / "run" / "submission" / "womd_trafficbots_tpu_rr_K1.tar.gz").exists()
    assert (tmp_path / "run" / "submission" / "womd_trafficbots_tpu_jf_K6.tar.gz").exists()
    # process 0 printed the val epoch line; process 1's stdout must not
    # (rank-0 gating of host prints — match the exact print format, the
    # WOMDMetrics warning text also contains the words "val/loss")
    assert "epoch 0 val/loss=" in outs[0]
    assert "epoch 0 val/loss=" not in outs[1]
    # challenge horizon: WOMD metrics must be ENABLED under the mesh — the
    # disabled-horizon warning would mean val/loss silently stopped being -mAP
    for out in outs:
        assert "WOMDMetrics" not in out or "disabled" not in out, out[-2000:]
