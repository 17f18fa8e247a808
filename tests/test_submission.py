"""Tests for the proto wire encoder and the submission writer."""
import os
import struct
import tarfile

import numpy as np

from trafficbots_tpu.eval.proto_wire import Message
from trafficbots_tpu.eval.submission import SubWOMD


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def decode_fields(buf):
    """Generic wire decoder -> list of (field, wire_type, value)."""
    out = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 5:
            v = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"wire type {wt}")
        out.append((field, wt, v))
    return out


def test_wire_roundtrip():
    m = (
        Message()
        .string(1, "hello")
        .varint(5, 2)
        .float32(3, 0.25)
        .packed_floats(2, [1.0, 2.0, 3.0])
    )
    fields = decode_fields(m.serialize())
    assert fields[0] == (1, 2, b"hello")
    assert fields[1] == (5, 0, 2)
    assert fields[2][0] == 3 and abs(fields[2][2] - 0.25) < 1e-7
    packed = fields[3][2]
    vals = struct.unpack("<3f", packed)
    assert vals == (1.0, 2.0, 3.0)


def test_wire_matches_google_protobuf():
    """Cross-check against the installed protobuf runtime if available."""
    try:
        from google.protobuf import descriptor_pb2
    except ImportError:
        return
    # encode a FileDescriptorProto-like message: name=1 (string), package=2
    ours = Message().string(1, "test.proto").string(2, "pkg").serialize()
    ref = descriptor_pb2.FileDescriptorProto(name="test.proto", package="pkg")
    assert ours == ref.SerializeToString()


def test_submission_writer(tmp_path):
    B, T80, A, K = 1, 80, 3, 6
    rng = np.random.RandomState(0)
    sub = SubWOMD(k_futures=2, activate=True, method_name="test")
    sub.add_to_submissions(
        waymo_trajs=rng.randn(B, T80, A, K, 2).astype(np.float32),
        waymo_scores=np.full((B, A, K), 1.0 / K, np.float32),
        mask_pred=np.array([[True, True, False]]),
        object_id=np.array([[7, 8, 9]]),
        scenario_center=np.zeros((B, 2), np.float32),
        scenario_yaw=np.zeros((B,), np.float32),
        scenario_id=["abc123"],
    )
    paths = sub.save_sub_files(str(tmp_path))
    assert len(paths) == 2
    for p in paths:
        with tarfile.open(p) as tar:
            names = tar.getnames()
            assert any(n.endswith(".bin") for n in names)
            binf = [n for n in names if n.endswith(".bin")][0]
            data = tar.extractfile(binf).read()
    # decode top level of the K=2 submission
    fields = decode_fields(data)
    by_field = {}
    for f, wt, v in fields:
        by_field.setdefault(f, []).append(v)
    assert by_field[2][0] == b"test_K2"
    assert by_field[5][0] == 1  # MOTION_PREDICTION
    scenario = decode_fields(by_field[6][0])
    assert scenario[0] == (1, 2, b"abc123")
    # single_predictions -> PredictionSet with 2 predictions
    pset = decode_fields(scenario[1][2])
    assert len(pset) == 2
    pred0 = decode_fields(pset[0][2])
    assert pred0[0] == (1, 0, 7)  # object_id
    # 2 scored trajectories for K=2
    assert sum(1 for f, _, _ in pred0 if f == 2) == 2
    st = decode_fields([v for f, _, v in pred0 if f == 2][0])
    assert st[0][0] == 1  # confidence
    traj = decode_fields(st[1][2])
    xs = struct.unpack(f"<{len(traj[0][2])//4}f", traj[0][2])
    assert len(xs) == 16  # 2 Hz over 8 s


def test_pack_test_submission_drops_pad_rows():
    """The action=test packer must filter final-batch pad rows (duplicate
    scenario_ids from the loader's pad-to-size) before they reach the
    submission accumulator."""
    from trafficbots_tpu.evaluation_loop import pack_test_submission

    B, T80, A, K = 3, 80, 2, 2
    rng = np.random.RandomState(1)
    pred = {
        "waymo_trajs": rng.randn(B, T80, A, K, 2).astype(np.float32),
        "waymo_scores": np.full((B, A, K), 1.0 / K, np.float32),
    }
    batch_np = {
        "history/agent/role": np.tile(
            np.array([[[False, False, True], [False, False, False]]]), (B, 1, 1)
        ),
        "history/agent/object_id": np.tile(np.array([[7, 8]]), (B, 1)),
        "scenario_center": np.zeros((B, 2), np.float32),
        "scenario_yaw": np.zeros((B,), np.float32),
        "scenario_id": ["s0", "s1", "s1"],
        "pad_mask": [False, False, True],  # row 2 repeats row 1
    }
    sub = SubWOMD(k_futures=1, activate=True)
    pack_test_submission(sub, pred, batch_np)
    assert len(sub.scenario_payloads[1]) == 2  # pad row dropped
    sids = [decode_fields(p)[0][2] for p in sub.scenario_payloads[1]]
    assert sids == [b"s0", b"s1"]

    # without pad_mask every row packs
    sub2 = SubWOMD(k_futures=1, activate=True)
    batch_np.pop("pad_mask")
    pack_test_submission(sub2, pred, batch_np)
    assert len(sub2.scenario_payloads[1]) == 3


def test_cli_test_action_writes_submissions(tmp_path):
    """e2e: action=test on synthetic data writes submission archives (the
    reference's test_step + submission flow, ref waymo_motion.py:902-953)."""
    from test_resume import TINY_OVERRIDES
    from trafficbots_tpu.run import main

    run = str(tmp_path / "run")
    main(["action=test", f"run_dir={run}", "val_batches=1"] + TINY_OVERRIDES)
    subdir = os.path.join(run, "submission")
    assert os.path.isdir(subdir)
    files = os.listdir(subdir)
    assert any(f.endswith(".tar.gz") for f in files), files
