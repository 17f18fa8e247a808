"""Optimizer, LR schedule, and the jitted (optionally sharded) train step.

Replaces the reference's PL configure_optimizers (waymo_motion.py:955-973):
Adam with a separate LR group for goal-predictor params, StepLR(gamma=0.5,
step=7 epochs), gradient clip 5 (configs/trainer/default.yaml:12). In optax
this is a multi_transform over a param-path predicate + a schedule read from
a step counter carried in the optimizer state.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from ..config import ExperimentConfig
from .. import orchestration as O


def _is_goal_predictor_path(path: Tuple[str, ...]) -> bool:
    """Matches the reference's `"goal_predictor" in name` split
    (waymo_motion.py:958-962); in our tree the goal/dest predictor lives
    exactly at goal_manager/predictor — anchor on both components so a
    future module merely named "*predictor*" cannot land in this LR group."""
    return "goal_manager" in path and "predictor" in path


def make_lr_schedule(cfg: ExperimentConfig, steps_per_epoch: int) -> optax.Schedule:
    """StepLR(gamma, step_size epochs). Ref configs/model/traffic_bots.yaml:226-229."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return cfg.optimizer.lr * (cfg.optimizer.scheduler_gamma ** (epoch // cfg.optimizer.scheduler_step_size))

    return schedule


def make_optimizer(cfg: ExperimentConfig, params, steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    base_sched = make_lr_schedule(cfg, steps_per_epoch)
    ratio = cfg.optimizer.lr_goal / cfg.optimizer.lr

    def goal_sched(count):
        return base_sched(count) * ratio

    flat = traverse_util.flatten_dict(params)
    labels = traverse_util.unflatten_dict(
        {k: ("goal" if _is_goal_predictor_path(k) else "main") for k in flat}
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.optimizer.gradient_clip_val),
        optax.multi_transform(
            {
                "main": optax.adam(base_sched),
                "goal": optax.adam(goal_sched),
            },
            labels,
        ),
    )
    return tx


def make_train_step(
    cfg: ExperimentConfig,
    model,
    tx: optax.GradientTransformation,
    axis_name: Optional[str] = None,
    donate: bool = True,
) -> Callable:
    """Build the (params, opt_state, batch, key) -> (params, opt_state, metrics)
    step. If axis_name is given the step is meant to run under shard_map and
    reduces grads/metrics across that axis.
    """

    def step(params, opt_state, batch, key, epoch=0):
        """`epoch` drives the teacher-forcing schedules; it is a device
        scalar so per-epoch decay (tf step_horizon / prob_forcing_agent,
        ref teacher_forcing.py:57-66) needs no recompilation."""

        def loss_fn(p):
            loss, metrics = O.training_step(cfg, model, p, batch, key, current_epoch=epoch)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = {k: jax.lax.psum(v, axis_name) for k, v in metrics.items()}
            metrics["loss"] = jax.lax.pmean(loss, axis_name)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        # per-module breakdown (the reference's track_grad_norm=2 +
        # WatchModel wandb histograms, configs/trainer/default.yaml:13 /
        # callbacks/wandb_callbacks.py:76-85): one norm per top-level param
        # subtree (map_encoder / latent_encoder / goal_manager / as2pl /
        # action head / ...) — computed from the already-reduced grads
        # pytree, so the extra cost is a handful of scalar reductions.
        for name, sub in grads.items():
            metrics[f"grad_norm/{name}"] = optax.global_norm(sub)
        return new_params, new_opt_state, metrics

    return step


def make_jitted_dp_train_step(cfg: ExperimentConfig, model, tx, mesh) -> Callable:
    """shard_map the train step over the scene batch; jit the result."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    inner = make_train_step(cfg, model, tx, axis_name="data")

    def mapped(params, opt_state, batch, key, epoch):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return inner(params, opt_state, batch, key, epoch)

    sharded = shard_map(
        mapped,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    def step(params, opt_state, batch, key, epoch=0):
        return jitted(params, opt_state, batch, key, jnp.asarray(epoch, jnp.int32))

    jitted = jax.jit(sharded, donate_argnums=(0, 1))
    return step
