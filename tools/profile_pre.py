"""Sub-phase timing of pre_processing on the real chip (scratch, PERF.md work)."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import time


def timed(fn, args, n=6):
    import jax
    import jax.numpy as jnp

    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu.data import preprocessing as P
    from trafficbots_tpu.data.synthetic import synthetic_episode_batch
    from trafficbots_tpu.geometry import pose_pe

    n_scene = int(os.environ.get("BENCH_N_SCENE", "64"))
    cfg = ExperimentConfig()
    batch_np = synthetic_episode_batch(cfg.data, n_scene=n_scene, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    m = cfg.model

    def cks(d, pred=lambda k: True):
        return sum(
            jnp.sum(v) for k, v in d.items()
            if pred(k) and v.dtype != bool and jnp.issubdtype(v.dtype, jnp.floating)
        )

    out = {}
    out["sc_ms"] = timed(lambda b: cks(P.scene_centric(b, 11, False), lambda k: k.startswith(("sc/", "gt/", "ref/"))), (batch,))
    scb = jax.jit(lambda b: P.scene_centric(b, 11, False))(batch)
    out["input_ms"] = timed(lambda b: cks(P.sc_input(b, m, 11, False), lambda k: k.startswith("input/")), (scb,))
    inb = jax.jit(lambda b: P.sc_input(b, m, 11, False))(scb)
    out["latent_ms"] = timed(lambda b: cks(P.sc_latent(b, m, False), lambda k: k.startswith("latent_")), (inb,))
    # individual heavy pieces
    out["map_pe_ms"] = timed(
        lambda b: jnp.sum(pose_pe(b["sc/map_pos"], b["sc/map_dir"], m.pose_pe_map, m.pe_dim)),
        (scb,),
    )
    out["map_attr_ms"] = timed(
        lambda b: jnp.sum(
            jnp.concatenate(
                [
                    jnp.broadcast_to(
                        b["sc/map_type"][:, :, None].astype(jnp.float32),
                        b["sc/map_valid"].shape + (b["sc/map_type"].shape[-1],),
                    ),
                    jnp.broadcast_to(
                        jnp.eye(b["sc/map_valid"].shape[2], dtype=jnp.float32)[None, None],
                        b["sc/map_valid"].shape + (b["sc/map_valid"].shape[2],),
                    ),
                ],
                axis=-1,
            )
        ),
        (scb,),
    )
    out["gt_agent_pe_ms"] = timed(
        lambda b: jnp.sum(pose_pe(b["agent/pos"], b["agent/yaw_bbox"], m.pose_pe_agent, m.pe_dim)),
        (scb,),
    )
    # dispatch floor
    out["floor_ms"] = timed(lambda b: jnp.sum(b["sc/map_dir"][0, 0]), (scb,))
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
