
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""A/B the fused node kernel: fp32 vs bf16 matmuls, block sizes (scratch)."""
import json
import time

import numpy as np


def timed(f, args, n=8):
    import jax

    jf = jax.jit(f)
    float(np.asarray(jf(*args)).ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(jf(*args)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from trafficbots_tpu.config import ExperimentConfig
    from trafficbots_tpu.ops.node_encoder import FusedNodeEncoder

    cfg = ExperimentConfig()
    B, P, N, D = 32, 1024, 20, 128
    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randn(B * P, N, D).astype(np.float32))
    flat_valid = jnp.asarray(rng.rand(B * P, N) > 0.1)

    out = {}
    # dispatch overhead calibration: trivial program
    out["trivial_ms"] = timed(lambda x: jnp.sum(x[:8]), (flat,))

    base = None
    for blk in (8, 32):
        for bf16 in (False, True):
            stack = FusedNodeEncoder(
                d_model=D, n_head=cfg.model.tf_cfg.n_head,
                n_layer=cfg.model.map_encoder.n_layer,
                d_feedforward=cfg.model.tf_cfg.d_feedforward,
                dropout_p=0.1, block_pl=blk, matmul_bf16=bf16,
            )
            if base is None:
                params = stack.init(jax.random.PRNGKey(0), flat[:64], flat_valid[:64])
                base = params

            def f(p, x, v, s=stack):
                return jnp.sum(s.apply(p, x, v, method="encode_pooled"))

            out[f"blk{blk}_{'bf16' if bf16 else 'fp32'}_ms"] = timed(f, (base, flat, flat_valid))

    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
