"""Device mesh + sharding helpers for data-parallel training.

TPU-native replacement for the reference's PyTorch-Lightning DDP
(run.py:51-53, NCCL allreduce): scenes shard over a 1-D "data" mesh axis,
parameters replicate, and gradients are reduced with `psum` over ICI inside
a single `shard_map`-wrapped train step. Multi-slice scaling uses the same
program over a ("data",) mesh spanning slices (DCN handled by the runtime).

The model is ~4M params (hidden 128), so pure DP is the right parallelism —
matching the reference's topology analysis (SURVEY.md section 2.2). The mesh
API still exposes an optional "model" axis for future TP experiments.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def allgather_pyobj(obj: Any) -> list:
    """Gather an arbitrary picklable host-side object from every process.

    Returns [obj_from_process_0, ..., obj_from_process_{P-1}], identical on
    all processes. Used where per-process collections are RAGGED (metric
    batches / submission payloads after per-process pad-row filtering) —
    array-wise `process_allgather` would build inconsistent collectives when
    the local leading dims differ, so serialize to bytes, exchange sizes
    (fixed [1]-shaped gather), zero-pad to the max and gather one fixed-size
    uint8 buffer. The torchmetrics `dist_sync_on_step` analog for host data
    (ref womd.py:44-49). Single-process: returns [obj] without any
    collective.
    """
    import pickle

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), dtype=np.uint8
    )
    sizes = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([payload.size], np.int64), tiled=True
        )
    ).reshape(-1)
    buf = np.zeros((int(sizes.max()),), np.uint8)
    buf[: payload.size] = payload
    gathered = np.asarray(
        multihost_utils.process_allgather(buf, tiled=True)
    ).reshape(jax.process_count(), -1)
    return [
        pickle.loads(gathered[p, : int(sizes[p])].tobytes())
        for p in range(jax.process_count())
    ]


def make_mesh(n_data: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices)
    return Mesh(np.asarray(devices[:n_data]).reshape(n_data), axis_names=("data",))


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Place a host batch with scenes sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))

    def _put(x):
        return jax.device_put(x, sharding)

    return {k: _put(v) for k, v in batch.items()}


def put_global_batch(batch_np: Dict[str, Any], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Host batch -> global jax.Arrays sharded over the data axis.

    Single-process: a plain device_put. Multi-process: each host passes its
    PROCESS-LOCAL slice (from a process-sharded EpisodeLoader) and
    `jax.make_array_from_process_local_data` assembles the global array
    without any cross-host transfer of someone else's scenes — the
    documented API for host-sharded input pipelines (SURVEY.md section 2.2;
    replaces the reference's per-rank DDP DataLoader)."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return {k: jax.device_put(jnp.asarray(v), sharding)
                for k, v in batch_np.items() if not isinstance(v, list)}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch_np.items() if not isinstance(v, list)
    }


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_parallel_train_step(
    train_step_fn: Callable,
    mesh: Mesh,
) -> Callable:
    """Wrap a per-shard (params, opt_state, batch, key) -> (params, opt_state,
    metrics) step with shard_map: batch sharded over "data", params/opt_state
    replicated, gradients psum-reduced inside `train_step_fn` via
    `psum_gradients`.
    """
    from jax.experimental.shard_map import shard_map

    def mapped(params, opt_state, batch, key):
        # distinct RNG per shard: fold in the data-axis index
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return train_step_fn(params, opt_state, batch, key)

    return shard_map(
        mapped,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )


def psum_gradients(grads, axis_name: str = "data"):
    """Average gradients over the data axis (ref: DDP allreduce)."""
    return jax.lax.pmean(grads, axis_name)


def psum_metrics(metrics: Dict[str, jnp.ndarray], axis_name: str = "data"):
    """Sum metric sums/counters over shards (ref: torchmetrics dist_reduce_fx=sum)."""
    return {k: jax.lax.psum(v, axis_name) for k, v in metrics.items()}
