"""Auxiliary subsystem tests: visualization rendering, interactive-challenge
metric packing, LR schedule semantics, CLI override parsing."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from trafficbots_tpu.config import DataConfig, ExperimentConfig, OptimizerConfig
from trafficbots_tpu.data.synthetic import synthetic_episode_batch
from trafficbots_tpu.eval.womd import WOMDMetrics
from trafficbots_tpu.training.train import make_lr_schedule
from trafficbots_tpu.run import apply_override


def _tiny_batch(seed=0, n_scene=1):
    data = DataConfig(n_agent=8, n_pl=16, n_pl_node=10, n_tl=6, n_tl_stop=6)
    return data, synthetic_episode_batch(data, n_scene=n_scene, seed=seed)


def test_vis_prediction_video(tmp_path):
    data, batch = _tiny_batch()
    from trafficbots_tpu.utils.vis import VisScene

    vs = VisScene(
        map_valid=batch["map/valid"][0], map_type=batch["map/type"][0],
        map_pos=batch["map/pos"][0], map_boundary=batch["map/boundary"][0],
    )
    episode = {
        "agent/valid": batch["agent/valid"][0][:20],
        "agent/pos": batch["agent/pos"][0][:20],
        "agent/yaw_bbox": batch["agent/yaw_bbox"][0][:20],
        "agent/size": batch["agent/size"][0],
        "agent/type": batch["agent/type"][0],
        "agent/role": batch["agent/role"][0],
    }
    path = vs.save_prediction_video(str(tmp_path / "gt.mp4"), episode)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_vis_attention_video_and_dest_image(tmp_path):
    data, batch = _tiny_batch(seed=1)
    from trafficbots_tpu.utils.vis import VisScene

    vs = VisScene(
        map_valid=batch["map/valid"][0], map_type=batch["map/type"][0],
        map_pos=batch["map/pos"][0], map_boundary=batch["map/boundary"][0],
    )
    T, A, P = 5, data.n_agent, data.n_pl
    rng = np.random.RandomState(0)
    attn = rng.rand(A, T, P).astype(np.float32)
    path = vs.save_attention_video(
        str(tmp_path / "attn.mp4"),
        map_valid=batch["map/valid"][0], map_pos=batch["map/pos"][0],
        agent_valid=batch["agent/valid"][0][:T], agent_pos=batch["agent/pos"][0][:T],
        agent_yaw=batch["agent/yaw_bbox"][0][:T, :, 0], agent_size=batch["agent/size"][0],
        attn_pl=attn, agent_idx=0,
    )
    assert os.path.exists(path) and os.path.getsize(path) > 0
    probs = rng.rand(A, P).astype(np.float32)
    img = vs.save_dest_prob_image(
        str(tmp_path / "dest.png"), batch["map/valid"][0], batch["map/pos"][0], probs
    )
    assert os.path.exists(img) and os.path.getsize(img) > 0


def test_interactive_challenge_packing():
    """Joint (interactive) layout: one joint prediction over the 2 predict
    agents per scene. Ref womd.py:37-42,92-104."""
    data, batch = _tiny_batch(seed=2, n_scene=2)
    # mark exactly 2 agents per scene as predict-agents
    role = batch["agent/role"]
    role[..., 2] = False
    role[:, :2, 2] = True
    wm = WOMDMetrics("joint", interactive_challenge=True, use_native=False)
    gt_pos = batch["agent/pos"]
    pred = gt_pos[:, 11:91][:, :, :, None, :]  # GT replay, K=1
    wm.update(batch, pred, None)
    out = wm.compute()
    assert out["joint/min_ade"] < 1e-4
    assert out["joint/miss_rate"] == 0.0


def test_lr_schedule_steplr():
    """StepLR(gamma=0.5, step_size=7 epochs). Ref traffic_bots.yaml:226-229."""
    cfg = ExperimentConfig(optimizer=OptimizerConfig(lr=1e-3, scheduler_gamma=0.5, scheduler_step_size=7))
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == 1e-3
    assert float(sched(69)) == 1e-3  # epoch 6
    assert float(sched(70)) == 5e-4  # epoch 7
    assert float(sched(140)) == 2.5e-4  # epoch 14


def test_cli_override_parsing():
    cfg = ExperimentConfig()
    cfg = apply_override(cfg, "model.hidden_dim", "64")
    assert cfg.model.hidden_dim == 64
    assert cfg.model.tf_cfg.d_model == 64  # __post_init__ sync
    cfg = apply_override(cfg, "rule_checker.enable_check_collided", "true")
    assert cfg.rule_checker.enable_check_collided is True
    cfg = apply_override(cfg, "post_processing.mtr_nms_thresh", "2.5,3.5,4.5")
    assert cfg.post_processing.mtr_nms_thresh == (2.5, 3.5, 4.5)
    cfg = apply_override(cfg, "optimizer.lr", "1e-4")
    assert cfg.optimizer.lr == 1e-4


def test_metrics_logger_sink_hook(tmp_path, monkeypatch):
    """TB_METRICS_HOOK plugs an external sink (the reference's wandb-logger
    analog, configs/loggers/wandb.yaml): every record reaches the callable;
    a raising sink warns once and disables itself without killing logging."""
    import json
    import sys
    import types
    import warnings

    from trafficbots_tpu.utils.logging import MetricsLogger

    calls = []
    mod = types.ModuleType("_fake_sink_mod")
    mod.log_metrics = calls.append
    monkeypatch.setitem(sys.modules, "_fake_sink_mod", mod)
    monkeypatch.setenv("TB_METRICS_HOOK", "_fake_sink_mod:log_metrics")

    lg = MetricsLogger(str(tmp_path / "run"))
    lg.log({"loss": 1.5, "skip_me": "not-a-float"}, step=3)
    assert len(calls) == 1
    assert calls[0]["loss"] == 1.5 and calls[0]["step"] == 3
    assert "skip_me" not in calls[0]

    # default callable name resolves too
    monkeypatch.setenv("TB_METRICS_HOOK", "_fake_sink_mod")
    lg2 = MetricsLogger(str(tmp_path / "run2"))
    lg2.log({"x": 1.0}, step=0)
    assert len(calls) == 2

    # a failing sink disables itself; jsonl keeps flowing
    def boom(rec):
        raise RuntimeError("sink down")

    lg3 = MetricsLogger(str(tmp_path / "run3"), sink=boom)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lg3.log({"a": 1.0}, step=1)
        lg3.log({"a": 2.0}, step=2)
    assert any("metrics sink failed" in str(x.message) for x in w)
    assert lg3.sink is None
    recs = [json.loads(l) for l in open(lg3.path)]
    assert [r["a"] for r in recs] == [1.0, 2.0]

    # a MISCONFIGURED hook (typo'd module/callable) warns and falls back to
    # jsonl-only instead of killing the run at logger construction
    monkeypatch.setenv("TB_METRICS_HOOK", "_no_such_module:nope")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lg4 = MetricsLogger(str(tmp_path / "run4"))
    assert lg4.sink is None
    assert any("failed to load" in str(x.message) for x in w)
    monkeypatch.setenv("TB_METRICS_HOOK", "_fake_sink_mod:no_such_callable")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert MetricsLogger(str(tmp_path / "run5")).sink is None
    assert any("failed to load" in str(x.message) for x in w)

    # unset env -> no sink
    monkeypatch.delenv("TB_METRICS_HOOK")
    assert MetricsLogger(str(tmp_path / "run6")).sink is None
