"""Speed-of-light kernel bench: factor evals/s/chip (BASELINE.md measurement
point).

Measures the pure batched linearization kernel — whitened residual + all
slot Jacobians for synthetic Pose2Pose2 batches (the M3500 hot kernel) at
sizes 1e4..1e6 — on whatever device JAX selects (the real TPU under the
driver). Reports evals/s = factors linearized per second, plus effective
FLOP/s using the analytic per-factor cost.

Usage: python tools/bench_kernels.py [--json out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_batch(n: int, seed: int = 0):
    import jax.numpy as jnp

    from rome_tpu.factors.pose2 import POSE2POSE2
    from rome_tpu.graph.lower import FactorBatch

    rng = np.random.default_rng(seed)
    z = rng.normal([1.0, 0.0, 0.1], 0.05, size=(n, 3))
    sqrt_info = np.broadcast_to(np.eye(3) * 10.0, (n, 3, 3))
    vslots = np.stack(
        [np.arange(n, dtype=np.int32), (np.arange(n, dtype=np.int32) + 1)], axis=1
    )
    return FactorBatch(
        ftype=POSE2POSE2,
        n=n,
        vtypes=("Pose2", "Pose2"),
        vslots=jnp.asarray(vslots),
        params={"z": jnp.asarray(z, jnp.float32),
                "sqrt_info": jnp.asarray(sqrt_info, jnp.float32)},
        weight=jnp.ones(n, jnp.float32),
    )


def main(out_json=None):
    import jax
    import jax.numpy as jnp

    from rome_tpu.graph.lower import GraphArrays
    from rome_tpu.manifolds.base import SE2_
    from rome_tpu.solvers.linearize import batch_linearize

    dev = jax.devices()[0]
    rows = []
    for n in (10_000, 100_000, 1_000_000):
        batch = _make_batch(n)
        rng = np.random.default_rng(1)
        values = {
            "Pose2": jnp.asarray(
                rng.normal(0, 1.0, size=(n + 1, 3)), jnp.float32
            )
        }
        ga = GraphArrays(
            type_names=["Pose2"],
            manifolds={"Pose2": SE2_},
            counts={"Pose2": n + 1},
            values0=values,
            free={"Pose2": jnp.ones(n + 1, jnp.float32)},
            batches=[batch],
            var_labels={"Pose2": [f"x{i}" for i in range(n + 1)]},
        )

        f = jax.jit(lambda v: batch_linearize(ga, batch, v))
        r0, Js = f(values)
        float(jnp.sum(r0[0]))  # force completion over the tunnel
        reps = 20 if n <= 100_000 else 5
        t0 = time.time()
        for _ in range(reps):
            r0, Js = f(values)
        float(jnp.sum(r0[0]) + sum(jnp.sum(J[0]) for J in Js))
        dt = (time.time() - t0) / reps
        evals_s = n / dt
        # analytic per-factor cost: residual (SE2 compose+log ~ 60 flops,
        # whiten 3x3 matvec 15) x 7 jacfwd tangents ~ 5e2 flops
        rows.append(
            dict(
                n=n,
                ms=round(dt * 1000, 3),
                evals_per_sec=round(evals_s),
                gflops_est=round(evals_s * 525 / 1e9, 1),
            )
        )
        print(rows[-1], flush=True)
    doc = dict(kernel="Pose2Pose2 linearize (residual + 2 Jacobians)",
               device=str(dev), rows=rows)
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(doc, fh, indent=1)
    print(json.dumps(doc))
    return doc


if __name__ == "__main__":
    out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None
    main(out)
    os._exit(0)
