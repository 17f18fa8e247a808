"""Tests for the offline packing pipeline (ETL) against the h5 contract."""
import numpy as np
import pytest

from trafficbots_tpu.config import DataConfig
from trafficbots_tpu.data.packing import (
    pack_scenario,
    polylines_from_polygon,
    write_h5,
)
from trafficbots_tpu.data.synthetic_scenario import synthetic_scenario
from trafficbots_tpu.data.h5_loader import (
    H5Dataset,
    tensor_size_test,
    tensor_size_train,
    tensor_size_val,
)

SMALL = dict(n_pl=64, n_tl=20, n_tl_stop=20, n_agent=8, n_agent_no_sim=16)


def test_polylines_from_polygon():
    poly = np.array([[0, 0, 0], [10, 0, 0], [10, 2, 0], [0, 2, 0]], float)
    pls = polylines_from_polygon(poly)
    assert len(pls) == 4
    # long edges are interpolated at ~1 m
    assert len(pls[0]) == 12  # int(10)+1 points + endpoint
    np.testing.assert_allclose(pls[0][0], [0, 0, 0])
    np.testing.assert_allclose(pls[0][-1], [10, 0, 0])
    np.testing.assert_allclose(pls[1], pls[0][::-1])


@pytest.mark.parametrize("split", ["training", "validation", "testing"])
def test_pack_scenario_contract(split):
    sc = synthetic_scenario(seed=1)
    ep, attrs = pack_scenario(sc, split, seed=0, **SMALL)

    d = DataConfig(n_pl=64, n_tl=20, n_tl_stop=20, n_agent=8, n_agent_no_sim=16)
    if split == "training":
        contract = tensor_size_train(d)
    elif split == "testing":
        contract = tensor_size_test(d)
    else:
        contract = tensor_size_val(d)
    for k, shape in contract.items():
        assert k in ep, f"{split}: missing {k}"
        assert tuple(ep[k].shape) == tuple(shape), f"{split}: {k} {ep[k].shape} != {shape}"
    assert attrs["scenario_id"] == "synthetic_1"
    assert attrs["with_map"]


def test_pack_scenario_semantics():
    sc = synthetic_scenario(seed=2)
    ep, attrs = pack_scenario(sc, "validation", seed=0, **SMALL)

    # SDC at index 0, centered at origin at t=0 (no random offset in val)
    assert ep["agent/role"][0, 0]
    np.testing.assert_allclose(ep["agent/pos"][0, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(ep["agent/yaw_bbox"][0, 0, 0], 0.0, atol=1e-5)

    # validity spans are contiguous after interpolation
    for a in range(8):
        v = ep["agent/valid"][:, a]
        if v.any():
            idx = np.nonzero(v)[0]
            assert (np.diff(idx) == 1).all(), "gaps must be interpolated"

    # signed speed consistent with velocity projection
    v = ep["agent/valid"]
    spd = ep["agent/spd"][v][:, 0]
    vel = ep["agent/vel"][v]
    yaw = ep["agent/yaw_bbox"][v][:, 0]
    proj = np.cos(yaw) * vel[:, 0] + np.sin(yaw) * vel[:, 1]
    assert (np.sign(spd[np.abs(spd) > 0.1]) == np.sign(proj[np.abs(spd) > 0.1])).all()

    # dest types consistent with agent types
    type_idx = np.argmax(ep["map/type"], -1)
    for a in range(8):
        if not ep["agent/valid"][:, a].any():
            continue
        dest_t = type_idx[ep["agent/dest"][a]]
        if ep["agent/type"][a, 0]:
            assert dest_t in (0, 1, 2, 4)
        elif ep["agent/type"][a, 1]:
            assert dest_t == 4
        else:
            assert dest_t in (3, 4)

    # acc is the finite difference of spd
    a0 = 0
    v0 = np.nonzero(ep["agent/valid"][:, a0])[0]
    if len(v0) > 2:
        t = v0[2]
        expected = (ep["agent/spd"][t, a0, 0] - ep["agent/spd"][t - 1, a0, 0]) / 0.1
        np.testing.assert_allclose(ep["agent/acc"][t, a0, 0], expected, atol=1e-4)

    # map boundary covers all valid polyline points
    b = ep["map/boundary"]
    pts = ep["map/pos"][ep["map/valid"]]
    assert pts[:, 0].min() >= b[0] and pts[:, 0].max() <= b[1]
    assert pts[:, 1].min() >= b[2] and pts[:, 1].max() <= b[3]


def test_pack_write_load_roundtrip(tmp_path):
    eps = [pack_scenario(synthetic_scenario(seed=s), "validation", seed=s, **SMALL) for s in range(2)]
    path = str(tmp_path / "validation.h5")
    n = write_h5(eps, path)
    assert n == 2
    d = DataConfig(n_pl=64, n_tl=20, n_tl_stop=20, n_agent=8, n_agent_no_sim=16)
    ds = H5Dataset(path, tensor_size_val(d), is_train=False)
    assert len(ds) == 2
    item = ds.get(0)
    assert item["scenario_id"] == b"synthetic_0"
    np.testing.assert_array_equal(item["agent/valid"], eps[0][0]["agent/valid"])
    assert item["map/pos"].dtype == np.float32


def test_training_random_offset():
    sc = synthetic_scenario(seed=3)
    ep, attrs = pack_scenario(sc, "training", seed=0, **SMALL)
    # training applies a random SE(2) offset: SDC not exactly at origin
    assert np.abs(ep["agent/pos"][0, 0]).max() > 1.0
    # center/yaw attrs invert the transform: sdc world pos recovered
    c, s = np.cos(attrs["scenario_yaw"]), np.sin(attrs["scenario_yaw"])
    p = ep["agent/pos"][0, 0]
    world = np.array(
        [p[0] * c - p[1] * s, p[0] * s + p[1] * c]
    ) + attrs["scenario_center"]
    sdc_world = np.asarray(sc["tracks"][0]["states"][0][:2])
    np.testing.assert_allclose(world, sdc_world, atol=1e-3)


def test_episode_loader_iteration(tmp_path):
    """Threaded EpisodeLoader: batching, ordering (val), random-index
    sampling (train), and list handling for scenario ids."""
    from trafficbots_tpu.data.h5_loader import EpisodeLoader

    d = DataConfig(n_pl=64, n_tl=20, n_tl_stop=20, n_agent=8, n_agent_no_sim=16)
    episodes = [
        pack_scenario(synthetic_scenario(seed=s), "validation", seed=0, **SMALL)
        for s in range(5)
    ]
    path = str(tmp_path / "validation.h5")
    write_h5(episodes, path)

    ds = H5Dataset(path, tensor_size_val(d), is_train=False)
    assert len(ds) == 5
    loader = EpisodeLoader(ds, batch_size=2)
    batches = list(loader)
    assert len(batches) == 3  # 2 + 2 + 1
    assert batches[0]["agent/valid"].shape == (2, d.n_step, d.n_agent)
    assert batches[-1]["agent/valid"].shape == (1, d.n_step, d.n_agent)
    # ordered iteration for val
    np.testing.assert_array_equal(batches[0]["episode_idx"], [0, 1])
    np.testing.assert_array_equal(batches[1]["episode_idx"], [2, 3])
    assert isinstance(batches[0]["scenario_id"], list)
    assert batches[0]["scenario_id"][0] == b"synthetic_0"
    # attrs ride along for the submission writer
    assert batches[0]["scenario_center"].shape == (2, 2)

    # train: random index per draw (ref data_h5_womd.py:28-30), deterministic
    # under a fixed seed
    ds_t = H5Dataset(path, tensor_size_val(d), is_train=True)
    l1 = [b["episode_idx"].tolist() for b in EpisodeLoader(ds_t, 2, shuffle_seed=7)]
    l2 = [b["episode_idx"].tolist() for b in EpisodeLoader(ds_t, 2, shuffle_seed=7)]
    assert l1 == l2
    flat = [i for b in l1 for i in b]
    assert len(flat) == 5 and all(0 <= i < 5 for i in flat)  # 2+2+1 draws
