"""CLI entry: fit / validate / test, with dotted-path config overrides.

Replaces the reference's Hydra composition root (run.py + configs/**):

    python -m trafficbots_tpu.run action=fit data.data_dir=/data/h5_womd \
        model.hidden_dim=128 ablation=simnet resume=runs/x/ckpt/last

Overrides are `key=value` pairs navigating the frozen dataclass tree
(dataclasses.replace under the hood), so every ablation switch of the
reference's YAML tree is reachable from the CLI. `ablation=<name>` applies a
preset from config.ablation (the docs/ablation_models.md recipes).
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Any, Dict, List, Optional

import numpy as np


def _coerce(val: str, current: Any) -> Any:
    if isinstance(current, bool):
        return val.lower() in ("1", "true", "yes")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(val)
    if isinstance(current, float):
        return float(val)
    if current is None:
        for cast in (int, float):
            try:
                return cast(val)
            except ValueError:
                pass
        if val.lower() in ("none", "null"):
            return None
        return val
    if isinstance(current, tuple):
        if val in ("[]", "()"):
            return ()
        return tuple(float(x) for x in val.strip("[]()").split(",") if x)
    return val


def apply_override(cfg, dotted: str, val: str):
    parts = dotted.split(".")
    if len(parts) == 1:
        current = getattr(cfg, parts[0])
        return dataclasses.replace(cfg, **{parts[0]: _coerce(val, current)})
    sub = getattr(cfg, parts[0])
    new_sub = apply_override(sub, ".".join(parts[1:]), val)
    return dataclasses.replace(cfg, **{parts[0]: new_sub})


def _find_config_snapshot(run_dir: Optional[str], resume: Optional[str]) -> Optional[str]:
    """Locate the config.json snapshot for a resume.

    Candidates, most specific first: INSIDE the checkpoint directory itself
    (self-describing checkpoints — CheckpointManager writes a config.json
    sidecar into every best/last save, so a checkpoint copied out of its run
    keeps its hyperparameters; ref save_hyperparameters, waymo_motion.py:63),
    then the run_dir, then — for an explicit path like
    `resume=runs/x/ckpt/last` — the checkpoint's parent directories.
    """
    cands = []
    if resume and resume not in ("1", "true", "True", "yes", "best", "last"):
        r = os.path.abspath(resume)
        cands.append(os.path.join(r, "config.json"))
    if run_dir:
        cands.append(os.path.join(run_dir, "config.json"))
        # resume=best/last resolve inside run_dir's ckpt dir
        if resume in ("1", "true", "True", "yes", "best", "last"):
            name = resume if resume in ("best", "last") else "last"
            cands.append(os.path.join(run_dir, "ckpt", name, "config.json"))
    if resume and resume not in ("1", "true", "True", "yes", "best", "last"):
        d = os.path.dirname(os.path.abspath(resume))
        cands += [os.path.join(d, "config.json"),
                  os.path.join(os.path.dirname(d), "config.json")]
    for p in cands:
        if os.path.isfile(p):
            return p
    return None


def snapshot_config(cfg, run_dir: str):
    """Persist the resolved experiment config into the run directory — the
    analog of the reference's checkpoint-embedded hyperparameters
    (save_hyperparameters, ref waymo_motion.py:63): `action=validate
    resume=best run_dir=X` later reproduces the training config with zero
    re-typed flags, with CLI overrides applied on top (the reference's
    `model_overrides` submission flow, ref run.py:40-44)."""
    import json

    from .config import config_to_dict

    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "config.json")
    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2)
    return path


def parse_args(argv: List[str]):
    import json

    from .config import ExperimentConfig, ablation, config_from_dict

    action = "fit"
    run_dir = None
    resume = None
    synthetic = False
    n_epochs = 1
    steps_per_epoch = None  # default: loader length (real data) or 100 (synthetic)
    val_batches = -1
    overrides = []
    ablations = []
    # pre-scan for run_dir/resume so a config snapshot (written at fit time)
    # can serve as the BASE config, with CLI overrides applied on top
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"expected key=value, got {arg}")
        k, v = arg.split("=", 1)
        if k == "run_dir":
            run_dir = v
        elif k == "resume":
            resume = v
    cfg = ExperimentConfig()
    loaded_from = None
    if resume:
        snap = _find_config_snapshot(run_dir, resume)
        if snap is not None:
            with open(snap) as f:
                cfg = config_from_dict(json.load(f))
            loaded_from = snap
        else:
            # resuming without the training config silently falls back to
            # defaults — at best a shape error, at worst a silently wrong
            # ablation if shapes agree. Be loud (stderr so it survives in
            # captured logs); every flag must then be re-passed by hand.
            print(
                f"WARNING: resume={resume}: no config.json snapshot found in "
                "the checkpoint/run directory — using DEFAULT config plus CLI "
                "overrides. If this checkpoint was trained with non-default "
                "flags you must re-pass all of them.",
                file=sys.stderr,
            )
    for arg in argv:
        k, v = arg.split("=", 1)
        if k == "action":
            action = v
        elif k == "ablation":
            cfg = ablation(v, cfg)
            ablations.append(v)
        elif k == "run_dir":
            run_dir = v
        elif k == "resume":
            resume = v
        elif k == "synthetic":
            synthetic = v.lower() in ("1", "true")
        elif k == "debug_nans":
            # trainer guard analog of the reference's detect_anomaly
            # (configs/trainer/default.yaml:17): fail fast on non-finite
            # values anywhere in a jitted computation
            if v.lower() in ("1", "true"):
                import jax

                jax.config.update("jax_debug_nans", True)
        elif k == "n_epochs":
            n_epochs = int(v)
        elif k == "steps_per_epoch":
            steps_per_epoch = int(v)
        elif k == "val_batches":
            val_batches = int(v)
        else:
            overrides.append((k, v))
    for k, v in overrides:
        cfg = apply_override(cfg, k, v)
    if run_dir is None:
        run_dir = os.path.join("runs", time.strftime("%Y%m%d_%H%M%S"))
    if loaded_from is not None:
        n_over = len(overrides) + len(ablations)
        print(f"config loaded from snapshot {loaded_from}"
              + (f" (+{n_over} CLI overrides on top)" if n_over else ""))
    return action, cfg, run_dir, resume, synthetic, n_epochs, steps_per_epoch, val_batches


def synthetic_loader(cfg, n_batches: int, seed: int = 0):
    from .data.synthetic import synthetic_episode_batch

    def it(epoch: int = 0):
        import jax

        pc, pi = jax.process_count(), jax.process_index()
        for i in range(n_batches):
            batch = synthetic_episode_batch(
                cfg.data, n_scene=cfg.data.batch_size,
                seed=seed + epoch * n_batches + i, with_history=True,
            )
            if pc > 1:
                # every process generates the identical global batch (same
                # seed), then keeps its contiguous slice — the synthetic
                # analog of the process-sharded EpisodeLoader
                assert cfg.data.batch_size % pc == 0, (
                    f"global batch_size {cfg.data.batch_size} not divisible "
                    f"by process count {pc}"
                )
                per = cfg.data.batch_size // pc
                batch = {k: v[pi * per : (pi + 1) * per] for k, v in batch.items()}
            yield batch

    return it


def _mean_metrics(metrics) -> Dict[str, float]:
    """Collapse psum'd `*_sum`/`*_count` pairs to per-element means for
    logging — the reference logs per-step means (waymo_motion.py:415-417),
    not device- and batch-scaled raw sums."""
    m = {k: float(v) for k, v in metrics.items()}
    out: Dict[str, float] = {}
    for k, v in m.items():
        if k.endswith("_count"):
            continue
        if k.endswith("_sum"):
            name = k[: -len("_sum")]
            out[name] = v / max(m.get(f"{name}_count", 1.0), 1.0)
        else:
            out[k] = v
    return out


def _resolve_resume(ckpt, resume: str, default: str, required: bool = False):
    """Map the CLI `resume=` value to a checkpoint name or explicit path.

    `resume=1/true` keeps the legacy behavior (restore `default`);
    `resume=best|last` picks that checkpoint; any other value is treated as
    a path to an Orbax checkpoint directory — the analog of the reference's
    `resume.checkpoint` wandb-artifact flow (ref run.py:33-47,
    configs/resume/submission.yaml).

    `required=True` (validate/test): an explicitly requested checkpoint that
    cannot be found is an ERROR — evaluating/submitting from randomly
    initialized params because of a typo'd path must not happen silently.
    Fit keeps resume-if-available semantics (idempotent restart scripts) but
    the caller warns when nothing was found."""
    if resume in ("1", "true", "True", "yes"):
        resume = default
    if resume in ("best", "last"):
        found = resume if ckpt.exists(resume) else None
    else:
        found = resume if os.path.isdir(resume) else None
    if found is None and required:
        raise SystemExit(f"resume={resume}: no such checkpoint (looked in {ckpt.directory})")
    return found


def main(argv: Optional[List[str]] = None):
    import jax

    # Honor JAX_PLATFORMS explicitly: some environments ship a PJRT plugin
    # whose registration overrides the env var (tests/conftest.py has the
    # same workaround), and initializing an unreachable accelerator hangs —
    # e.g. `JAX_PLATFORMS=cpu python -m trafficbots_tpu.run ...` must never
    # touch the TPU plugin.
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp

    action, cfg, run_dir, resume, synthetic, n_epochs, steps_per_epoch, val_batches = parse_args(
        argv if argv is not None else sys.argv[1:]
    )

    from . import orchestration as O
    from .evaluation_loop import Validator
    from .parallel.mesh import make_mesh
    from .training.checkpoint import CheckpointManager
    from .training.train import make_jitted_dp_train_step, make_optimizer
    from .utils.logging import MetricsLogger, Profiler
    from jax.sharding import NamedSharding, PartitionSpec as P

    # rank-0-only host work in multi-process runs: checkpoint/submission/
    # metrics files and stdout (ref waymo_motion.py:666,734,951-953, run.py:12)
    is_main = jax.process_index() == 0

    # shape-bucketed batches (data/bucketing.py): slice the fixed map/agent
    # capacities to each batch's real maximum before device placement
    bucket = None
    if cfg.data.bucket_capacity:
        if jax.process_count() > 1:
            if is_main:
                print("bucket_capacity disabled: multi-process run "
                      "(per-process maxima would desynchronize shapes)")
        else:
            from .data.bucketing import bucket_slice

            bucket = lambda b: bucket_slice(
                b, cfg.data.bucket_pl_multiple, cfg.data.bucket_agent_multiple
            )[0]

    from .config import config_to_dict

    key = jax.random.PRNGKey(cfg.seed)
    logger = MetricsLogger(run_dir) if is_main else None
    prof = Profiler()
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"), config=config_to_dict(cfg))

    # data
    if synthetic:
        if steps_per_epoch is None:
            steps_per_epoch = 100
        train_iter_fn = synthetic_loader(cfg, steps_per_epoch)
        val_iter_fn = synthetic_loader(cfg, max(val_batches, 1), seed=10_000)
    else:
        from .data.h5_loader import make_loaders

        # sub-epoch cadence: an "epoch" is limit_train_batches of the packed
        # file (ref configs/trainer/default.yaml:3), and the LR schedule's
        # epoch accounting uses the REAL loader length, not a CLI default.
        # Multi-process runs shard every global batch over hosts so IO
        # scales with process count (SURVEY.md section 2.2).
        train_loader, val_loader, test_loader = make_loaders(
            cfg.data, cfg.seed, limit_train_batches=cfg.limit_train_batches,
            shard_index=jax.process_index(), shard_count=jax.process_count(),
        )
        if steps_per_epoch is None:
            steps_per_epoch = len(train_loader)

        def train_iter_fn(epoch: int = 0):
            train_loader.set_epoch(epoch)
            return iter(train_loader)

        def val_iter_fn(epoch: int = 0):
            return iter(val_loader)

    # init params from one batch
    init_batch = next(iter(train_iter_fn() if callable(train_iter_fn) else train_iter_fn))
    init_batch_j = {k: jnp.asarray(v) for k, v in init_batch.items() if not isinstance(v, list)}
    key, k_init = jax.random.split(key)
    model, params = O.init_params(cfg, k_init, init_batch_j)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if is_main:
        print(f"model initialized: {n_params/1e6:.2f}M params, run_dir={run_dir}")

    if action == "fit":
        if is_main:
            snapshot_config(cfg, run_dir)
        mesh = make_mesh()
        tx = make_optimizer(cfg, params, steps_per_epoch)
        opt_state = tx.init(params)
        # full trainer state resume (ref run.py:33-47): params, optimizer,
        # epoch, global step and PRNG key — epoch-scheduled teacher forcing
        # and the LR schedule continue exactly where they stopped.
        start_epoch, global_step = 0, 0
        target = _resolve_resume(ckpt, resume, default="last") if resume else None
        if resume and target is None and is_main:
            print(f"resume={resume}: no checkpoint found, starting fresh")
        if target is not None:
            restored = ckpt.restore_trainer_state(
                target,
                {"params": params, "opt_state": opt_state,
                 "epoch": np.asarray(0), "global_step": np.asarray(0),
                 "rng": np.asarray(key)},
            )
            params, opt_state = restored["params"], restored["opt_state"]
            start_epoch = int(restored["epoch"])
            global_step = int(restored["global_step"])
            key = jnp.asarray(restored["rng"])
            if is_main:
                print(f"resumed from {target} at epoch {start_epoch}, step {global_step}")
        step_fn = make_jitted_dp_train_step(cfg, model, tx, mesh)
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
        validator = Validator(cfg, model, mesh=mesh)

        from .parallel.mesh import put_global_batch

        for epoch in range(start_epoch, n_epochs):
            for batch_np in train_iter_fn(epoch):
                if bucket is not None:
                    batch_np = bucket(batch_np)
                batch = put_global_batch(batch_np, mesh)
                key, k_step = jax.random.split(key)
                with prof.phase("train_step"):
                    params, opt_state, metrics = step_fn(params, opt_state, batch, k_step, epoch)
                if global_step % 50 == 0 and is_main:
                    m = _mean_metrics(metrics)
                    logger.log(m, global_step)
                    print(f"epoch {epoch} step {global_step} loss={m['loss']:.4f}")
                global_step += 1

            # validation
            validator.reset()
            for i, batch_np in enumerate(val_iter_fn()):
                if 0 <= val_batches <= i:
                    break
                if bucket is not None:
                    batch_np = bucket(batch_np)
                key, k_val = jax.random.split(key)
                with prof.phase("val_step"):
                    validator.step(params, batch_np, k_val)
            val_metrics = validator.epoch_end()
            # render prediction/attention videos + dest-prob images for the
            # first n_video_batch val batches (ref waymo_motion.py:666-680).
            # Key split happens on EVERY process (the key stream must stay
            # replicated for the SPMD train step); rendering itself is
            # single-process only — its jit consumes host-local arrays,
            # which is incompatible with a multi-host mesh.
            key, k_vis = jax.random.split(key)
            if is_main and cfg.n_video_batch > 0 and jax.process_count() == 1:
                from .evaluation_loop import render_validation_media

                media = render_validation_media(
                    cfg, model, params, val_iter_fn, k_vis,
                    out_dir=os.path.join(run_dir, "videos", f"epoch{epoch}"),
                )
                if media:
                    print(f"validation media written: {len(media)} files")
            if is_main:
                logger.log(val_metrics, global_step, phase="val")
            # checkpoint saves run on EVERY process: params/opt_state are
            # sharded over the global mesh and Orbax's save is a collective
            # (per-process shard writes + a barrier) — gating it on rank 0
            # would deadlock any multi-host fit. Orbax itself keeps
            # metadata writes rank-0-only.
            state = {"params": params, "opt_state": opt_state,
                     "epoch": np.asarray(epoch + 1), "global_step": np.asarray(global_step),
                     "rng": np.asarray(key)}
            ckpt.save_last(state, global_step, val_metrics)
            ckpt.save_if_best(state, global_step, val_metrics)
            if is_main:
                print(f"epoch {epoch} val/loss={val_metrics['val/loss']:.4f}")
        if is_main:
            logger.log(prof.summary(), global_step, phase="profile")

    elif action == "validate":
        from .eval.submission import SubWOMD

        target = _resolve_resume(ckpt, resume, default="best", required=True) if resume else None
        if target is not None:
            params = ckpt.restore(target, {"params": params})["params"]
        # submission writing during validation (ref waymo_motion.py:657-665,
        # 724-753): both reactive-replay (K=1) and joint-future (K=6) files
        write_subs = os.environ.get("WRITE_SUBMISSIONS", "0").lower() in ("1", "true")
        sub_rr = SubWOMD(k_futures=1, interactive_challenge=cfg.interactive_challenge,
                         activate=write_subs, method_name="trafficbots_tpu_rr")
        sub_jf = SubWOMD(k_futures=cfg.n_joint_future,
                         interactive_challenge=cfg.interactive_challenge,
                         activate=write_subs, method_name="trafficbots_tpu_jf")
        validator = Validator(
            cfg, model, mesh=make_mesh() if jax.device_count() > 1 else None,
            sub_rr=sub_rr, sub_jf=sub_jf,
        )
        for i, batch_np in enumerate(val_iter_fn()):
            if 0 <= val_batches <= i:
                break
            if bucket is not None:
                batch_np = bucket(batch_np)
            key, k_val = jax.random.split(key)
            validator.step(params, batch_np, k_val)
        val_metrics = validator.epoch_end()
        if is_main:
            logger.log(val_metrics, 0, phase="val")
            for k, v in sorted(val_metrics.items()):
                if "/" in k and "waymo_metrics" not in k:
                    print(f"{k}: {v:.4f}")
            if cfg.n_video_batch > 0 and jax.process_count() == 1:
                from .evaluation_loop import render_validation_media

                key, k_vis = jax.random.split(key)
                media = render_validation_media(
                    cfg, model, params, val_iter_fn, k_vis,
                    out_dir=os.path.join(run_dir, "videos"),
                )
                for p in media:
                    print(f"media written: {p}")
            if write_subs:
                for p in sub_rr.save_sub_files(os.path.join(run_dir, "submission")):
                    print(f"submission written: {p}")
                for p in sub_jf.save_sub_files(os.path.join(run_dir, "submission")):
                    print(f"submission written: {p}")

    elif action == "test":
        # Test split: no GT — prior latent + predicted goal, submission files
        # only. Ref waymo_motion.py:902-953 + submission.py.
        from .evaluation_loop import pack_test_submission, test_step_device
        from .eval.submission import SubWOMD

        target = _resolve_resume(ckpt, resume, default="best", required=True) if resume else None
        if target is not None:
            params = ckpt.restore(target, {"params": params})["params"]
        if synthetic:
            test_iter_fn = synthetic_loader(cfg, max(val_batches, 1), seed=20_000)
        else:
            test_iter_fn = lambda: iter(test_loader)

        sub = SubWOMD(
            k_futures=cfg.n_joint_future,
            interactive_challenge=cfg.interactive_challenge,
            activate=True,
        )
        jitted = jax.jit(
            lambda params, batch, key: test_step_device(cfg, model, params, batch, key)
        )
        for i, batch_np in enumerate(test_iter_fn()):
            if 0 <= val_batches <= i:
                break
            if bucket is not None:
                batch_np = bucket(batch_np)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, list)}
            key, k_test = jax.random.split(key)
            with prof.phase("test_step"):
                pred = jitted(params, batch, k_test)
            pack_test_submission(sub, pred, batch_np)
        # multi-host: the loader is process-sharded, so each process packed
        # only its own scenes — union the payloads before the rank-0 write
        sub.sync()
        if is_main:
            paths = sub.save_sub_files(os.path.join(run_dir, "submission"))
            for p in paths:
                print(f"submission written: {p}")
    else:
        raise SystemExit(f"unknown action {action}")


if __name__ == "__main__":
    main()
