import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""A/B the node-kernel pipeline_blocks knob at full batch-128 scale (scratch)."""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from trafficbots_tpu.ops.node_encoder import FusedNodeEncoder

    n_scene = int(_os.environ.get("AB_SCENES", "128"))
    BP, N, D = n_scene * 1024, 20, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BP, N, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(BP, N) < 0.9)

    out = {}
    checksum0 = None
    # (block_pl, n_sub): same STEP=blk*sub means same grid count and same
    # wide-matmul width; smaller blk within it shrinks the [blk*20, blk*20]
    # block-diagonal score redundancy (the one remaining FLOP lever)
    pairs = [(16, 1), (8, 2), (8, 4), (8, 8)]  # blk must be a multiple of 8
    if _os.environ.get("AB_PAIRS"):
        pairs = [tuple(int(v) for v in p.split("x"))
                 for p in _os.environ["AB_PAIRS"].split(",")]
    for blk, sub in pairs:
        enc = FusedNodeEncoder(
            d_model=D, n_head=4, n_layer=3, d_feedforward=128,
            dropout_p=0.1, block_pl=blk, pipeline_blocks=sub,
        )
        params = enc.init(jax.random.PRNGKey(0), x[:64], valid[:64])

        @jax.jit
        def f(x, valid):
            return jnp.sum(enc.apply(params, x, valid, method="encode_pooled"))

        ref = float(f(x, valid))  # compile + D2H sync
        # the wide emission only changes matmul ROW counts, which cannot
        # change per-element MXU accumulation order -> bit-identical
        if checksum0 is None:
            checksum0 = ref
        assert ref == checksum0, (sub, ref, checksum0)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            got = float(f(x, valid))
            ts.append(time.perf_counter() - t0)
        assert got == ref, (got, ref)
        out[f"blk{blk}_sub{sub}_ms"] = round(sorted(ts)[len(ts) // 2] * 1e3, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
