"""scenario_from_womd_proto on a stub proto (no waymo_open_dataset needed).

The real scenario_pb2.Scenario is only available with the waymo package
(absent here; test_official_metrics.py gates on the same), but the adapter
touches protos exclusively through attribute access and WhichOneof — a
duck-typed stub exercises every field mapping the adapter performs
(ref pack_h5_womd.py:96-125,199-232): lane/edge/line type codes, stop-sign
lane override, x2 polyline subsampling, exit-lane topology edges, crosswalk
polygon -> polylines, the 9 -> 5 traffic-light state fold, object_type-1,
and SDC/track_index plumbing — then runs the result end-to-end through
pack_scenario against the h5 tensor contract.
"""
import numpy as np
import pytest

from trafficbots_tpu.config import DataConfig
from trafficbots_tpu.data.h5_loader import tensor_size_train
from trafficbots_tpu.data.packing import pack_scenario
from trafficbots_tpu.data.womd_adapter import fold_tl_state, scenario_from_womd_proto

N_STEP = 91
SMALL = dict(n_pl=64, n_tl=20, n_tl_stop=20, n_agent=8, n_agent_no_sim=16)


class _NS:
    """Attribute bag (SimpleNamespace clone that plays nice with lists)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _pt(x, y, z=0.0):
    return _NS(x=float(x), y=float(y), z=float(z))


class _MapFeature:
    def __init__(self, fid, kind, feat):
        self.id = fid
        self._kind = kind
        setattr(self, kind, feat)

    def WhichOneof(self, name):
        assert name == "feature_data"
        return self._kind


def _track(tid, object_type, x0, y0, heading, speed, valid_from=0, valid_to=N_STEP):
    states = []
    x, y = x0, y0
    for t in range(N_STEP):
        states.append(_NS(
            center_x=x, center_y=y, center_z=0.0,
            length=4.5, width=2.0, height=1.6, heading=heading,
            velocity_x=speed * np.cos(heading), velocity_y=speed * np.sin(heading),
            valid=(valid_from <= t < valid_to),
        ))
        x += speed * np.cos(heading) * 0.1
        y += speed * np.sin(heading) * 0.1
    return _NS(id=tid, object_type=object_type, states=states)


def _lane(fid, lane_type, x0, y0, heading, n_pts=24, exit_lanes=()):
    pts = [_pt(x0 + i * 2.0 * np.cos(heading), y0 + i * 2.0 * np.sin(heading))
           for i in range(n_pts)]
    return _MapFeature(fid, "lane", _NS(type=lane_type, polyline=pts, exit_lanes=list(exit_lanes)))


def _stub_scenario():
    tracks = [
        _track(100, 1, 0.0, 0.0, 0.0, 8.0),        # SDC vehicle (WOMD type 1)
        _track(101, 1, 10.0, 4.0, 0.1, 6.0),
        _track(102, 2, -8.0, 2.0, 1.5, 1.5),       # pedestrian
        _track(103, 3, 5.0, -6.0, -0.5, 4.0),      # cyclist
        _track(104, 1, 30.0, 10.0, 3.0, 5.0, valid_from=20),
    ]
    map_features = [
        _lane(0, 1, -40, 0, 0.0, exit_lanes=[1]),   # FREEWAY -> 0, edge 0->1
        _lane(1, 2, 8, 0, 0.0),                     # SURFACE_STREET -> 1, edge 1->-1
        _lane(2, 0, -40, 8, 0.0),                   # UNDEFINED -> 1
        _lane(3, 3, -40, -8, 0.0),                  # BIKE_LANE -> 3
        _MapFeature(4, "stop_sign", _NS(lane=[1], position=_pt(8, 0))),
        _MapFeature(5, "road_edge", _NS(type=1, polyline=[_pt(-40, 16 + 0.1 * i, 0) for i in range(20)])),
        _MapFeature(6, "road_edge", _NS(type=2, polyline=[_pt(-40 + 2 * i, -16, 0) for i in range(20)])),
        _MapFeature(7, "road_line", _NS(type=1, polyline=[_pt(-40 + 2 * i, 4, 0) for i in range(20)])),
        _MapFeature(8, "road_line", _NS(type=2, polyline=[_pt(-40 + 2 * i, -4, 0) for i in range(20)])),
        _MapFeature(9, "road_line", _NS(type=3, polyline=[_pt(-40 + 2 * i, 12, 0) for i in range(20)])),
        _MapFeature(10, "crosswalk", _NS(polygon=[_pt(0, -2), _pt(4, -2), _pt(4, 2), _pt(0, 2)])),
        _MapFeature(11, "speed_bump", _NS(polygon=[_pt(20, -2), _pt(23, -2), _pt(23, 2), _pt(20, 2)])),
        _MapFeature(12, "unused_kind_none", _NS()),
    ]
    map_features[12]._kind = None  # WhichOneof returns None -> skipped

    dynamic = []
    for t in range(N_STEP):
        dynamic.append(_NS(lane_states=[
            _NS(state=4, lane=0, stop_point=_pt(-2, 0)),   # ARROW_CAUTION... 4 -> 1 (stop)
            _NS(state=6, lane=1, stop_point=_pt(6, 0)),    # 6 -> 3 (go)
        ]))

    return _NS(
        scenario_id="stub_0001",
        current_time_index=10,
        sdc_track_index=0,
        tracks_to_predict=[_NS(track_index=1), _NS(track_index=3)],
        objects_of_interest=[101, 103],
        tracks=tracks,
        map_features=map_features,
        dynamic_map_states=dynamic,
    )


def test_fold_tl_state():
    # ref pack_h5_womd.py:96-118: unknown / stop / caution / go / flashing
    assert [fold_tl_state(s) for s in range(9)] == [0, 1, 2, 3, 1, 2, 3, 4, 4]
    with pytest.raises(ValueError):
        fold_tl_state(9)


def test_field_mapping():
    sc = scenario_from_womd_proto(_stub_scenario())

    assert sc["scenario_id"] == "stub_0001"
    assert sc["current_step"] == 10
    assert sc["sdc_track_index"] == 0
    assert sc["track_index_predict"] == [1, 3]
    assert sc["object_id_interest"] == [101, 103]

    # object_type - 1: WOMD 1/2/3 -> 0 (vehicle) / 1 (ped) / 2 (cyclist)
    assert [t["type"] for t in sc["tracks"]] == [0, 0, 1, 2, 0]
    assert sc["tracks"][0]["id"] == 100
    # states keep [x, y, z, l, w, h, heading, vx, vy, valid] x 91 steps
    st = np.asarray(sc["tracks"][4]["states"])
    assert st.shape == (N_STEP, 10)
    assert st[:20, 9].sum() == 0 and st[20:, 9].all()  # valid_from=20

    by_id = {}
    for f in sc["map_features"]:
        by_id.setdefault(f["id"], []).append(f)
    # lane type codes + stop-sign override of the car lane (1 -> 2)
    assert by_id[0][0]["type"] == 0
    assert by_id[1][0]["type"] == 2  # was 1, stop sign on lane 1
    assert by_id[2][0]["type"] == 1
    assert by_id[3][0]["type"] == 3
    # road edges type+3; road lines broken/solid/double
    assert by_id[5][0]["type"] == 4 and by_id[6][0]["type"] == 5
    assert by_id[7][0]["type"] == 6 and by_id[8][0]["type"] == 7 and by_id[9][0]["type"] == 8
    # crosswalk -> 10, speed bump -> 9; 4-corner polygon -> 4 polylines
    assert [f["type"] for f in by_id[10]] == [10] * 4
    assert [f["type"] for f in by_id[11]] == [9] * 4
    assert 12 not in by_id  # WhichOneof None skipped

    # x2 polyline subsampling: 24 lane points -> 12, 20 edge points -> 10
    assert len(by_id[0][0]["xyz"]) == 12
    assert len(by_id[5][0]["xyz"]) == 10
    np.testing.assert_allclose(by_id[0][0]["xyz"][1][0], by_id[0][0]["xyz"][0][0] + 4.0)

    # lane topology: explicit exit edge + -1 terminator for exit-less lanes
    assert [0, 1] in sc["map_edges"]
    assert [1, -1] in sc["map_edges"]

    # TL fold applied per step
    assert sc["tl_states"][0]["lane_state"] == [1, 3]
    assert sc["tl_states"][0]["lane_id"] == [0, 1]
    assert len(sc["tl_states"]) == N_STEP


def test_packs_end_to_end():
    sc = scenario_from_womd_proto(_stub_scenario())
    ep, attrs = pack_scenario(sc, "training", seed=0, **SMALL)
    d = DataConfig(n_pl=64, n_tl=20, n_tl_stop=20, n_agent=8, n_agent_no_sim=16)
    for k, shape in tensor_size_train(d).items():
        assert k in ep and tuple(ep[k].shape) == tuple(shape), k
    assert attrs["scenario_id"] == "stub_0001"
    assert attrs["with_map"]
    # the SDC (always swapped to slot 0) is valid the whole episode
    assert ep["agent/valid"][:, 0].all()
