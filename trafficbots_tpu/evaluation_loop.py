"""Validation & test loops: rollouts -> metrics -> post-processing -> submission.

Port of the reference's validation_step/test_step/epoch_end orchestration
(/root/reference/src/pl_modules/waymo_motion.py:574-953). The device-side
work (two rollouts + post-processing) is one jitted function; the host-side
work (WOMD metric packing, submissions, videos) consumes buffered outputs at
the end — replacing the reference's per-batch GPU->CPU hops
(SURVEY.md hard part #8).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExperimentConfig
from .data.preprocessing import extract, pre_processing
from . import orchestration as O
from .eval import metrics as M
from .eval.postprocessing import waymo_post_processing
from .eval.womd import WOMDMetrics
from .eval.submission import SubWOMD
from .sim.teacher_forcing import teacher_forcing_mask
from .training.loss import training_loss


def validation_device_step(
    cfg: ExperimentConfig, model, params, batch: Dict[str, jnp.ndarray], key: jax.Array,
    allow_map_chunk: bool = True,
) -> Dict[str, Any]:
    """Device-side part of validation_step (jittable).

    Returns reactive-replay + joint-future rollout summaries, metric sums,
    and post-processed prediction dicts. Ref waymo_motion.py:574-753.

    `allow_map_chunk=False` disables the chunked episode map encode; the
    Validator sets it when the step is GSPMD-sharded over a mesh (the batch
    axis traced here is then global — see orchestration.encode_episode_features).
    """
    k1, k2 = jax.random.split(key)
    # val semantics: input/prior views come from the separately packed
    # history/* keys (ref scene_centric.py:93 `prefix = "history/"`), while
    # gt/* stays on the full-GT agent/* keys for metrics and losses.
    batch = pre_processing(batch, cfg.model, n_step_hist=cfg.time_step_current + 1, training=False)
    feats = O.encode_episode_features(
        model, params, batch, training=False, key=None,
        allow_map_chunk=allow_map_chunk,
    )
    input_dict = extract(batch, "input")

    goal_gt = goal_valid = goal_pred = None
    if cfg.model.goal_manager.goal_attr_mode != "dummy":
        goal_gt, goal_valid = O.get_gt_goal(
            cfg, input_dict["agent_valid"], batch["gt/goal"], batch["gt/dest"]
        )
        goal_pred = model.apply(
            {"params": params}, method="pred_goal",
            agent_type=batch["ref/agent_type"], map_type=batch["ref/map_type"],
            agent_state=batch["ref/agent_state"], **feats["input"],
        )

    latent_post = model.apply(
        {"params": params}, method="latent", posterior=True, **feats["latent_post"]
    )
    latent_prior = model.apply(
        {"params": params}, method="latent", posterior=False, **feats["latent_prior"]
    )

    # ---- reactive replay (posterior latent, GT goal, deterministic)
    mask_tf = teacher_forcing_mask(O.tf_cfg_to_sim(cfg.tf_reactive_replay), batch["gt/valid"])
    buf_rr = O.reactive_replay(
        cfg, model, params, batch, feats["input"], latent_post,
        goal_gt, goal_valid, mask_tf, k1,
        deterministic_latent=True, deterministic_action=True,
    )
    gt_valid_roll = jnp.swapaxes(batch["gt/valid"][:, cfg.time_step_sim_start :], 1, 2)
    gt_state_roll = jnp.swapaxes(batch["gt/state"][:, cfg.time_step_sim_start :], 1, 2)

    err_rr = M.error_metrics_update(
        buf_rr.valid, buf_rr.preds, gt_valid_roll, gt_state_roll,
        buf_rr.override_masks, batch["ref/agent_role"],
    )
    rule_rr = M.rule_metrics_update(
        buf_rr.valid, buf_rr.override_masks, buf_rr.violations, batch["ref/agent_type"]
    )
    _, train_m_rr = training_loss(
        cfg.training_metrics,
        pred_valid=buf_rr.valid,
        diffbar_rewards_valid=buf_rr.diffbar_rewards_valid,
        diffbar_rewards=buf_rr.diffbar_rewards,
        override_masks=buf_rr.override_masks,
        agent_role=batch["ref/agent_role"],
        goal_valid=goal_valid, goal_pred=goal_pred, goal_gt=goal_gt,
        latent_post=latent_post, latent_prior=latent_prior,
        step_start=cfg.time_step_sim_start,
    )

    fs = buf_rr.step_future_start
    pred_rr = waymo_post_processing(
        cfg.post_processing,
        valid=jnp.any(buf_rr.valid, axis=-1),
        scores=jnp.ones_like(buf_rr.preds[:, :, None, 0, 0]),
        trajs=buf_rr.preds[:, :, None, fs:],
        agent_type=batch["ref/agent_type"],
    )

    # ---- joint future prediction (prior latent, predicted goal, K futures)
    buf_jf, goal_sample, goal_logp = O.joint_future_pred(
        cfg, model, params, batch, feats["input"], latent_prior, goal_pred, goal_valid, k2
    )
    err_jf = M.error_metrics_update(
        buf_jf.valid, buf_jf.preds, gt_valid_roll, gt_state_roll,
        buf_jf.override_masks, batch["ref/agent_role"],
    )
    rule_jf = M.rule_metrics_update(
        buf_jf.valid, buf_jf.override_masks, buf_jf.violations, batch["ref/agent_type"]
    )
    pred_jf = waymo_post_processing(
        cfg.post_processing,
        valid=jnp.any(buf_jf.valid[:, :, 0], axis=-1),
        scores=jnp.exp(buf_jf.latent_log_probs[..., 0] + goal_logp),
        trajs=buf_jf.preds[:, :, :, fs:],
        agent_type=batch["ref/agent_type"],
    )

    return {
        "err_rr": err_rr, "rule_rr": rule_rr, "train_rr": train_m_rr,
        "err_jf": err_jf, "rule_jf": rule_jf,
        "pred_rr": pred_rr, "pred_jf": pred_jf,
        "goal_sample": goal_sample, "goal_logp": goal_logp,
        "buf_rr_preds": buf_rr.preds, "buf_rr_valid": buf_rr.valid,
        "buf_jf_preds": buf_jf.preds, "buf_jf_valid": buf_jf.valid,
    }


class Validator:
    """Host-side accumulation across validation batches + epoch-end compute."""

    def __init__(self, cfg: ExperimentConfig, model, use_native_metrics: bool = True,
                 sub_rr: Optional[SubWOMD] = None, sub_jf: Optional[SubWOMD] = None,
                 mesh=None):
        """`mesh` (optional jax.sharding.Mesh with a "data" axis) shards the
        validation batch over devices; metric sums come back replicated and
        the post-processed predictions gather to the host for WOMD packing —
        the eval analog of the DP train step (SURVEY.md section 2.2)."""
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        self.womd_rr = WOMDMetrics(
            "reactive_replay", cfg.time_step_end, cfg.time_step_current,
            cfg.interactive_challenge, use_native=use_native_metrics,
        )
        self.womd_jf = WOMDMetrics(
            "joint_future_pred", cfg.time_step_end, cfg.time_step_current,
            cfg.interactive_challenge, use_native=use_native_metrics,
        )
        self.sub_rr = sub_rr or SubWOMD(k_futures=1, activate=False)
        self.sub_jf = sub_jf or SubWOMD(k_futures=cfg.n_joint_future, activate=False)
        # multi-process: each process packs its own loader shard's scenes and
        # SubWOMD.sync() (called in epoch_end) unions the payloads so the
        # rank-0 write is complete — unlike the reference, which restricts
        # submission writing to single-GPU runs (ref submission.py:12)
        self._jitted = None
        self.reset()

    def reset(self):
        self.sums: Dict[str, Dict[str, jnp.ndarray]] = {
            k: {} for k in ("err_rr", "rule_rr", "train_rr", "err_jf", "rule_jf")
        }
        self.womd_rr.reset()
        self.womd_jf.reset()
        self.sub_rr.reset()
        self.sub_jf.reset()

    def _local_rows(self, x, n_local: int) -> np.ndarray:
        """Device output -> the numpy rows belonging to THIS process.

        Single-process: the whole array. Multi-process: the batch is
        process-sharded (each host fed only its own scenes via
        make_array_from_process_local_data), so WOMD packing consumes the
        host-addressable shards — ordered by their global row offset,
        deduplicated by offset because the pred outputs are only
        CONSTRAINED to P("data") (a replicated or partially-replicated
        layout would otherwise repeat rows across local devices) — and
        the cross-host union happens once at epoch end in WOMDMetrics.sync()
        (ref womd.py:44-49 dist_sync_on_step). Exercised by
        tests/test_multiprocess.py on a 2-process CPU mesh."""
        if jax.process_count() > 1 and self.mesh is not None:
            by_start = {}
            for s in x.addressable_shards:
                start = s.index[0].start or 0
                if start not in by_start:
                    by_start[start] = np.asarray(s.data)
            rows = np.concatenate(
                [by_start[k] for k in sorted(by_start)], axis=0
            )
            assert rows.shape[0] == n_local, (
                f"device output rows ({rows.shape[0]}) != process-local batch "
                f"rows ({n_local}); output sharding constraint not honored?"
            )
            return rows
        return np.asarray(x)

    def step(self, params, batch_np: Dict[str, np.ndarray], key) -> None:
        if self._jitted is None:
            cfg, model, mesh = self.cfg, self.model, self.mesh

            def fn(params, batch, key):
                out = validation_device_step(
                    cfg, model, params, batch, key,
                    allow_map_chunk=mesh is None,
                )
                if mesh is not None:
                    # pin the per-scene prediction outputs to the data axis:
                    # GSPMD is otherwise free to replicate them (observed on
                    # the h5 validate program), which would hand _local_rows
                    # every process's rows instead of this host's slice
                    from jax.sharding import NamedSharding, PartitionSpec

                    spec = NamedSharding(mesh, PartitionSpec("data"))
                    for pk in ("pred_rr", "pred_jf"):
                        out[pk] = jax.tree.map(
                            lambda a: jax.lax.with_sharding_constraint(a, spec),
                            out[pk],
                        )
                return out

            self._jitted = jax.jit(fn)
        if self.mesh is not None:
            # scenes shard over the data axis (multi-process: batch_np is the
            # process-local slice and the global array is assembled without
            # cross-host data movement); GSPMD propagates the sharding
            from .parallel.mesh import put_global_batch

            batch = put_global_batch(batch_np, self.mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, list)}
        out = self._jitted(params, batch, key)

        # metric sums are replicated global reductions -> addressable everywhere
        for k in self.sums:
            self.sums[k] = M.add_metric_sums(self.sums[k], jax.tree.map(np.asarray, out[k]))

        # host-side WOMD packing (tiny arrays). Multi-process: batch_np is
        # this process's slice of the global batch (process-sharded loader)
        # and _local_rows() extracts the matching device-output rows, so
        # packing stays host-local; WOMDMetrics.sync() unions the
        # accumulated inputs across hosts once at epoch end.
        mask_pred = batch_np.get("history/agent/role", batch_np["agent/role"])[..., 2]
        object_id = batch_np.get(
            "history/agent/object_id",
            batch_np.get("agent/object_id", np.broadcast_to(
                np.arange(batch_np["agent/valid"].shape[-1]), batch_np["agent/valid"].shape[::2]
            )),
        )
        n_local = mask_pred.shape[0]
        trajs_rr = self._local_rows(out["pred_rr"]["waymo_trajs"], n_local)
        scores_rr = self._local_rows(out["pred_rr"]["waymo_scores"], n_local)
        trajs_jf = self._local_rows(out["pred_jf"]["waymo_trajs"], n_local)
        scores_jf = self._local_rows(out["pred_jf"]["waymo_scores"], n_local)
        # sharded val/test loaders pad the final partial global batch to size
        # (h5_loader pad_mask); pad rows are duplicates and must not reach
        # the WOMD metrics or the submission files. (Device-side metric SUMS
        # above do include them — same approximation as the reference's DDP
        # sampler duplicates.)
        pads = batch_np.get("pad_mask")
        if pads is not None and any(pads):
            keep = ~np.asarray(pads)
            nB = len(pads)
            batch_np = {
                k: (
                    [x for x, m in zip(v, keep) if m]
                    if isinstance(v, list) and len(v) == nB
                    else v[keep]
                    if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == nB
                    else v
                )
                for k, v in batch_np.items()
                if k != "pad_mask"
            }
            trajs_rr, scores_rr = trajs_rr[keep], scores_rr[keep]
            trajs_jf, scores_jf = trajs_jf[keep], scores_jf[keep]
            mask_pred, object_id = mask_pred[keep], object_id[keep]
        self.womd_rr.update(batch_np, trajs_rr, scores_rr)
        self.womd_jf.update(batch_np, trajs_jf, scores_jf)

        # every process packs its local rows; the epoch-end sync unions them
        # (the WRITE stays rank-0-gated in run.py — ref waymo_motion.py:951-953)
        if self.sub_rr.activate or self.sub_jf.activate:
            common = dict(
                mask_pred=mask_pred,
                object_id=object_id,
                scenario_center=batch_np.get("scenario_center", np.zeros((mask_pred.shape[0], 2))),
                scenario_yaw=batch_np.get("scenario_yaw", np.zeros(mask_pred.shape[0])),
                scenario_id=batch_np.get(
                    "scenario_id", [str(i) for i in batch_np.get("episode_idx", range(mask_pred.shape[0]))]
                ),
            )
            self.sub_rr.add_to_submissions(trajs_rr, scores_rr, **common)
            self.sub_jf.add_to_submissions(trajs_jf, scores_jf, **common)

    def epoch_end(self) -> Dict[str, float]:
        """Ref waymo_motion.py:755-794. val/loss = -mAP(joint_future_pred)."""
        out: Dict[str, float] = {}
        out.update(M.error_metrics_compute(self.sums["err_rr"], "reactive_replay/"))
        out.update(M.rule_metrics_compute(self.sums["rule_rr"], "reactive_replay/"))
        out.update(M.error_metrics_compute(self.sums["err_jf"], "joint_future_pred/"))
        out.update(M.rule_metrics_compute(self.sums["rule_jf"], "joint_future_pred/"))
        tm = self.sums["train_rr"]
        for name in ("vae_kl", "diffbar_reward", "goal_loss"):
            if f"{name}_sum" in tm:
                out[f"reactive_replay/{name}"] = float(tm[f"{name}_sum"]) / max(float(tm[f"{name}_count"]), 1.0)
        # cross-host union of WOMD metric inputs and submission payloads
        # (collective; no-op when single-process) before the host-side
        # metric math / rank-0 file write
        self.womd_rr.sync()
        self.womd_jf.sync()
        self.sub_rr.sync()
        self.sub_jf.sync()
        out.update(self.womd_rr.compute())
        out.update(self.womd_jf.compute())
        if "joint_future_pred/mean_average_precision" in out:
            out["val/loss"] = -out["joint_future_pred/mean_average_precision"]
        else:
            # WOMD metrics disabled (e.g. debug horizons shorter than the
            # challenge's 80 future steps): monitor the reactive-replay
            # position error instead of a constant -0.0 so save_if_best
            # stays meaningful (ref waymo_motion.py:785-790 uses -mAP)
            out["val/loss"] = out.get("reactive_replay/err/pos_meter", 0.0)
        return out


_VIS_JIT_CACHE: Dict[Any, Any] = {}


def _vis_device_step(cfg: ExperimentConfig, model, params, batch, key):
    """Reactive-replay rollout with attention collection + dest probabilities,
    for validation-time media rendering (ref waymo_motion.py:666-680)."""
    batch = pre_processing(batch, cfg.model, n_step_hist=cfg.time_step_current + 1, training=False)
    feats = O.encode_episode_features(model, params, batch, training=False, key=None)
    input_dict = extract(batch, "input")

    goal_gt = goal_valid = goal_pred = dest_probs = None
    if cfg.model.goal_manager.goal_attr_mode != "dummy":
        goal_gt, goal_valid = O.get_gt_goal(
            cfg, input_dict["agent_valid"], batch["gt/goal"], batch["gt/dest"]
        )
        goal_pred = model.apply(
            {"params": params}, method="pred_goal",
            agent_type=batch["ref/agent_type"], map_type=batch["ref/map_type"],
            agent_state=batch["ref/agent_state"], **feats["input"],
        )
        if cfg.model.goal_manager.goal_attr_mode == "dest" and goal_pred is not None:
            dest_probs = goal_pred.probs  # [B, A, P]

    latent_post = model.apply(
        {"params": params}, method="latent", posterior=True, **feats["latent_post"]
    )
    mask_tf = teacher_forcing_mask(O.tf_cfg_to_sim(cfg.tf_reactive_replay), batch["gt/valid"])
    k1, k2 = jax.random.split(key)
    buf = O.reactive_replay(
        cfg, model, params, batch, feats["input"], latent_post,
        goal_gt, goal_valid, mask_tf, k1,
        deterministic_latent=True, deterministic_action=True,
        collect_attention=True,
    )

    # K=6 joint-future rollout for prediction videos (ref
    # waymo_motion.py:734-753 renders the joint_future_pred videos too —
    # prior latent + sampled goal, the rollout a user actually inspects)
    latent_prior = model.apply(
        {"params": params}, method="latent", posterior=False, **feats["latent_prior"]
    )
    buf_jf, goal_sample, goal_logp = O.joint_future_pred(
        cfg, model, params, batch, feats["input"], latent_prior,
        goal_pred, goal_valid, k2,
    )
    jf_scores = jnp.exp(buf_jf.latent_log_probs[..., 0] + goal_logp)  # [B, A, K]
    return buf, dest_probs, buf_jf, jf_scores


def render_validation_media(
    cfg: ExperimentConfig, model, params, val_iter_fn, key,
    out_dir: str, n_batches: Optional[int] = None,
) -> List[str]:
    """Render prediction videos, attention videos and dest-probability images
    for the first `cfg.n_video_batch` validation batches.

    Capability port of the reference's per-epoch video logging
    (waymo_motion.py:666-680,734-753,796-900 + n_video_batch at
    configs/model/traffic_bots.yaml:10); artifacts land under `out_dir`
    instead of wandb. Returns the written file paths; empty when cv2 is
    unavailable (headless images).
    """
    from .utils.vis import _HAS_CV2, VisScene

    if not _HAS_CV2:
        return []
    import os

    n_batches = cfg.n_video_batch if n_batches is None else n_batches
    # cache the jitted vis program across epochs: a fresh lambda per call
    # would defeat jax.jit's function-identity cache and recompile the
    # collect_attention rollout every epoch. Keyed on cfg with a weakref
    # identity check on the model — id() keys can be reused after GC and
    # would hand a later model the stale closure.
    import weakref

    entry = _VIS_JIT_CACHE.get(cfg)
    jitted = entry[1] if entry is not None and entry[0]() is model else None
    if jitted is None:
        jitted = jax.jit(lambda p, b, k: _vis_device_step(cfg, model, p, b, k))
        _VIS_JIT_CACHE[cfg] = (weakref.ref(model), jitted)
    paths: List[str] = []
    for batch_idx, batch_np in enumerate(val_iter_fn()):
        if batch_idx >= n_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, list)}
        key, k_vis = jax.random.split(key)
        buf, dest_probs, buf_jf, jf_scores = jitted(params, batch, k_vis)
        buf = jax.tree.map(np.asarray, buf)
        buf_jf = jax.tree.map(np.asarray, buf_jf)
        jf_scores = np.asarray(jf_scores)
        fs = buf.step_future_start

        n_scene = batch_np["agent/valid"].shape[0]
        for idx in range(n_scene):
            scene = VisScene(
                batch_np["map/valid"][idx], batch_np["map/type"][idx],
                batch_np["map/pos"][idx], batch_np["map/boundary"][idx],
            )
            episode = {
                "agent/valid": batch_np["agent/valid"][idx],
                "agent/pos": batch_np["agent/pos"][idx],
                "agent/yaw_bbox": batch_np["agent/yaw_bbox"][idx],
                "agent/size": batch_np["agent/size"][idx],
                "agent/type": batch_np["agent/type"][idx],
                "agent/role": batch_np["agent/role"][idx],
            }
            for k in ("tl_stop/valid", "tl_stop/pos", "tl_stop/state"):
                if k in batch_np:
                    episode[k] = batch_np[k][idx]
            # rollout outputs are [A, S, ...]; videos consume step-major [S, A, ...]
            violations = np.zeros_like(buf.valid[idx], dtype=bool)
            for v in buf.violations.values():
                violations |= np.asarray(v[idx], dtype=bool)
            prediction = {
                "agent/valid": buf.valid[idx].swapaxes(0, 1)[fs:],
                "agent/pos": buf.preds[idx, :, :, :2].swapaxes(0, 1)[fs:],
                "agent/yaw_bbox": buf.preds[idx, :, :, 2:3].swapaxes(0, 1)[fs:],
                "violations": violations.swapaxes(0, 1)[fs:],
            }
            tag = f"{batch_idx}-{idx}"
            paths.append(scene.save_prediction_video(
                os.path.join(out_dir, f"reactive_replay_{tag}.mp4"),
                episode, prediction, step_current=cfg.time_step_current,
            ))
            # joint-future K videos: all K for the first batch, K=0 only for
            # the rest (ref waymo_motion.py:742 `k_to_log`). buf_jf layout is
            # [B, A, K, S, ...] after flatten_repeat.
            fs_jf = buf_jf.step_future_start
            k_to_log = buf_jf.valid.shape[2] if batch_idx == 0 else 1
            for kf in range(k_to_log):
                viol_jf = np.zeros_like(buf_jf.valid[idx, :, kf], dtype=bool)
                for v in buf_jf.violations.values():
                    viol_jf |= np.asarray(v[idx, :, kf], dtype=bool)
                pred_jf = {
                    "agent/valid": buf_jf.valid[idx, :, kf].swapaxes(0, 1)[fs_jf:],
                    "agent/pos": buf_jf.preds[idx, :, kf, :, :2].swapaxes(0, 1)[fs_jf:],
                    "agent/yaw_bbox": buf_jf.preds[idx, :, kf, :, 2:3].swapaxes(0, 1)[fs_jf:],
                    "violations": viol_jf.swapaxes(0, 1)[fs_jf:],
                }
                score = float(np.max(jf_scores[idx, :, kf]))
                paths.append(scene.save_prediction_video(
                    os.path.join(out_dir, f"joint_future_K{kf}_{tag}.mp4"),
                    episode, pred_jf, step_current=cfg.time_step_current,
                    title=f"joint_future K={kf} score={score:.3f}",
                ))
            if buf.attn and "attn_pl" in buf.attn:
                sdc = int(np.argmax(batch_np["agent/role"][idx, :, 0]))
                paths.append(scene.save_attention_video(
                    os.path.join(out_dir, f"attn_pl_{tag}.mp4"),
                    batch_np["map/valid"][idx], batch_np["map/pos"][idx],
                    buf.valid[idx].swapaxes(0, 1),
                    buf.preds[idx, :, :, :2].swapaxes(0, 1),
                    buf.preds[idx, :, :, 2].swapaxes(0, 1),
                    batch_np["agent/size"][idx],
                    buf.attn["attn_pl"][idx],
                    agent_idx=sdc,
                ))
            if dest_probs is not None:
                sdc = int(np.argmax(batch_np["agent/role"][idx, :, 0]))
                paths.append(scene.save_dest_prob_image(
                    os.path.join(out_dir, f"dest_prob_{tag}.png"),
                    batch_np["map/valid"][idx], batch_np["map/pos"][idx],
                    np.asarray(dest_probs[idx]), agent_idx=sdc,
                ))
    return paths


def test_step_device(cfg: ExperimentConfig, model, params, batch, key):
    """Test: no GT — history copied into agent keys, prior latent + predicted
    goal, submissions only. Ref waymo_motion.py:902-949."""
    b = dict(batch)
    for k in ("valid", "vel", "acc", "yaw_rate", "pos", "yaw_bbox", "spd", "size", "type", "z"):
        b[f"agent/{k}"] = b[f"history/agent/{k}"]
    b["tl_stop/valid"] = b["history/tl_stop/valid"]
    b["tl_stop/pos"] = b["history/tl_stop/pos"]
    b["tl_stop/state"] = b["history/tl_stop/state"]
    b["tl_stop/dir"] = b["history/tl_stop/dir"]

    pb = pre_processing(b, cfg.model, n_step_hist=cfg.time_step_current + 1, training=False)
    feats = O.encode_episode_features(model, params, pb, training=False, key=None)
    input_dict = extract(pb, "input")

    goal_valid = jnp.any(input_dict["agent_valid"], axis=1)
    goal_pred = None
    if cfg.model.goal_manager.goal_attr_mode != "dummy":
        goal_pred = model.apply(
            {"params": params}, method="pred_goal",
            agent_type=pb["ref/agent_type"], map_type=pb["ref/map_type"],
            agent_state=pb["ref/agent_state"], **feats["input"],
        )
    latent_prior = model.apply(
        {"params": params}, method="latent", posterior=False, **feats["latent_prior"]
    )
    buf, goal_sample, goal_logp = O.joint_future_pred(
        cfg, model, params, pb, feats["input"], latent_prior, goal_pred, goal_valid, key
    )
    fs = buf.step_future_start
    pred = waymo_post_processing(
        cfg.post_processing,
        valid=jnp.any(buf.valid[:, :, 0], axis=-1),
        scores=jnp.exp(buf.latent_log_probs[..., 0] + goal_logp),
        trajs=buf.preds[:, :, :, fs:],
        agent_type=pb["ref/agent_type"],
    )
    return pred


def pack_test_submission(sub, pred, batch_np: Dict[str, np.ndarray]) -> None:
    """Pack one test batch's device outputs into the submission accumulator.

    Final-batch pad rows (h5_loader repeats the last episodes so device
    shapes stay static; `pad_mask` rides along) are dropped HERE — compute
    ran on the full padded batch, but duplicate scenario_ids must not reach
    the submission file. Ref waymo_motion.py:902-949 + submission.py:45-112.
    """
    mask_pred = np.asarray(batch_np["history/agent/role"])[..., 2]
    n_scene, n_agent = mask_pred.shape
    keep = ~np.asarray(batch_np.get("pad_mask", [False] * n_scene), bool)
    sids = batch_np.get(
        "scenario_id", [str(s) for s in batch_np.get("episode_idx", range(n_scene))]
    )
    sub.add_to_submissions(
        np.asarray(pred["waymo_trajs"])[keep],
        np.asarray(pred["waymo_scores"])[keep],
        mask_pred=mask_pred[keep],
        object_id=np.asarray(
            batch_np.get(
                "history/agent/object_id",
                np.broadcast_to(np.arange(n_agent), (n_scene, n_agent)),
            )
        )[keep],
        scenario_center=np.asarray(
            batch_np.get("scenario_center", np.zeros((n_scene, 2)))
        )[keep],
        scenario_yaw=np.asarray(batch_np.get("scenario_yaw", np.zeros(n_scene)))[keep],
        scenario_id=[s for s, k in zip(sids, keep) if k],
    )
