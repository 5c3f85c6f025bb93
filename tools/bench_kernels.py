"""Speed-of-light kernel bench: factor evals/s/chip (BASELINE.md measurement
point).

Measures the pure batched linearization kernel — whitened residual + all
slot Jacobians for synthetic Pose2Pose2 batches (the M3500 hot kernel) at
sizes 1e4..1e6.

Methodology (round-3 fix): the kernel is iterated K times INSIDE one jitted
``lax.scan`` with a data dependency between iterations (the output feeds a
tiny perturbation of the next input, defeating CSE/DCE), so the measurement
contains zero dispatch latency — the round-2 harness timed one dispatch per
rep and, over the tunneled TPU, reported the ~25 ms round-trip as kernel
time (n=1e4 "553 ms" row). Reports evals/s, effective GFLOP/s, and
%-of-roofline against the HBM-bandwidth ceiling (the kernel is strongly
memory-bound: ~156 B and ~525 flops per factor => ~3.4 flops/byte, far
below the chip's compute:bandwidth balance point).

Usage: python tools/bench_kernels.py [--json out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-factor analytic cost of Pose2Pose2 linearization
FLOPS_GENERIC = 525        # SE2 compose+log+whiten (~75) x 7 jacfwd tangents
FLOPS_FUSED = 150          # closed-form: ~8 transcendentals + whitening macs
BYTES_PER_EVAL = 156       # 2 poses + z + sqrt_info read, r0 + 2 J written
HBM_BYTES_PER_S = 819e9    # TPU v5e HBM bandwidth (public spec)


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


def bench_packed(sizes=((10_000, 400), (100_000, 100), (1_000_000, 20))):
    """Packed coordinate-plane Pallas kernel (ops/linearize_pallas.py):
    one (24, n) plane-major input -> one (24, n) output, full-tile
    streaming. Moved bytes = 2 * 24 * 4 = 192 B/eval vs the 160 B true
    payload (1.2x), vs up to ~42x for the (n,3)/(n,3,3) layouts."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rome_tpu.ops.linearize_pallas import (
        pack_pose2pose2, pose2pose2_linearize_planes,
    )

    rows = []
    for n, K in sizes:
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
        q = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
        z = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
        S = jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32) * 10.0, (n, 3, 3))
        )
        w = jnp.ones((n,), jnp.float32)
        X = pack_pose2pose2(p, q, z, S, w)

        def body(Xc, _):
            Y = pose2pose2_linearize_planes(Xc)
            # pin f32: under x64 (bench.py) the 1e-30 literal promotes the
            # carry to f64 and the Mosaic compile crashes downstream
            upd = (1e-30 * jnp.sum(Y)).astype(jnp.float32)
            return Xc + upd, ()

        # SCALAR-FETCH timing: over the tunneled device
        # jax.block_until_ready is a NO-OP (measured r5: it returned in
        # 0.3 ms while the actual result fetch took 2.36 s) — only a
        # device_get forces completion. The jitted program returns one
        # scalar; float() is the fence. K is sized so the ~10 ms RTT is
        # <10% of the timed region.
        f = jax.jit(
            lambda Xc: jnp.sum(lax.scan(body, Xc, None, length=K)[0])
        )
        float(f(X))
        t_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(X))
            t_best = min(t_best, (time.perf_counter() - t0) / K)
        evals_s = n / t_best
        rows.append(
            dict(
                n=n,
                us=round(t_best * 1e6, 1),
                evals_per_sec=round(evals_s),
                gflops_est=round(evals_s * FLOPS_FUSED / 1e9, 1),
                pct_of_hbm_roofline=round(
                    100.0 * evals_s / (HBM_BYTES_PER_S / BYTES_PER_EVAL), 1
                ),
                pct_of_packed_roofline=round(
                    100.0 * evals_s / (HBM_BYTES_PER_S / 192.0), 1
                ),
            )
        )
        print("pallas_packed", rows[-1], flush=True)
    return rows


def measure_stream_bw():
    """Empirical elementwise-stream ceiling of THIS chip (read+write GB/s):
    the spec HBM number is not achievable by an elementwise pipeline, so
    the honest roofline denominator is measured, not quoted."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    X = jnp.zeros((24, 8, 125_000), jnp.float32) + 1.0
    K = 50

    def body(Xc, _):
        return Xc * 1.0000001 + 1e-30, ()

    g = jax.jit(lambda Xc: jnp.sum(lax.scan(body, Xc, None, length=K)[0]))
    float(g(X))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(X))
        best = min(best, (time.perf_counter() - t0) / K)
    return 2 * X.size * 4 / best


def main(out_json=None):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rome_tpu.graph.lower import GraphArrays
    from rome_tpu.manifolds.base import SE2_
    from rome_tpu.solvers.linearize import batch_linearize

    dev = jax.devices()[0]
    all_rows = {}
    try:
        all_rows["pallas_packed"] = bench_packed()
    except Exception as e:
        all_rows["pallas_packed"] = {"error": repr(e)}
    try:
        measured_bw = measure_stream_bw()
    except Exception:
        measured_bw = None
    if measured_bw and isinstance(all_rows.get("pallas_packed"), list):
        for r in all_rows["pallas_packed"]:
            r["pct_of_measured_roofline"] = round(
                100.0 * r["evals_per_sec"] / (measured_bw / 192.0), 1
            )
    for variant, fused, flops in (
        ("fused_analytic", True, FLOPS_FUSED),
        ("generic_jacfwd", False, FLOPS_GENERIC),
    ):
      rows = []
      for n, K in ((10_000, 400), (100_000, 100), (1_000_000, 20)):
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

        def body(vals, _):
            r0, Js = batch_linearize(ga, batch, vals, fused=fused)
            # loop-carried dependency: a scalar distilled from this
            # iteration's outputs perturbs the next input, so XLA cannot
            # hoist or dedupe the kernel across scan steps
            upd = 1e-30 * (jnp.sum(r0) + sum(jnp.sum(J) for J in Js))
            return {"Pose2": vals["Pose2"] + upd}, ()

        # scalar-fetch fence (see bench_packed: block_until_ready does not
        # block over the tunneled device)
        f = jax.jit(
            lambda v: jnp.sum(lax.scan(body, v, None, length=K)[0]["Pose2"])
        )
        float(f(values))  # compile + warm
        t_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(values))
            t_best = min(t_best, (time.perf_counter() - t0) / K)
        evals_s = n / t_best
        roofline_evals_s = HBM_BYTES_PER_S / BYTES_PER_EVAL
        rows.append(
            dict(
                n=n,
                us=round(t_best * 1e6, 1),
                evals_per_sec=round(evals_s),
                gflops_est=round(evals_s * flops / 1e9, 1),
                pct_of_hbm_roofline=round(100.0 * evals_s / roofline_evals_s, 1),
            )
        )
        print(variant, rows[-1], flush=True)
      all_rows[variant] = rows
    rows = (
        all_rows["pallas_packed"]
        if isinstance(all_rows.get("pallas_packed"), list)
        else all_rows["fused_analytic"]
    )
    doc = dict(
        kernel="Pose2Pose2 linearize (residual + 2 Jacobians)",
        device=str(dev),
        methodology="K-deep on-device lax.scan with loop-carried dependency; zero dispatch in the timed region",
        roofline=dict(
            bytes_per_eval=BYTES_PER_EVAL,
            flops_per_eval=FLOPS_FUSED,
            hbm_bytes_per_s=HBM_BYTES_PER_S,
            ceiling_evals_per_sec=round(HBM_BYTES_PER_S / BYTES_PER_EVAL),
            packed_bytes_per_eval=192,
            packed_ceiling_evals_per_sec=round(HBM_BYTES_PER_S / 192.0),
            # corrected roofline (r5): the spec HBM rate is not reachable
            # by any elementwise pipeline on this chip — the measured
            # stream ceiling (elementwise scan, read+write) is the honest
            # denominator; the packed kernel's gap to it is the number
            # that says how much kernel headroom actually remains
            measured_stream_bytes_per_s=(
                round(measured_bw) if measured_bw else None
            ),
            measured_ceiling_evals_per_sec=(
                round(measured_bw / 192.0) if measured_bw else None
            ),
            note=(
                "ceiling assumes pure HBM streaming of 156 B/eval of true "
                "payload. The r4 diagnosis — (n,3)/(n,3,3) layouts fill "
                "3/128 lanes per tile, moving up to ~42x the payload — is "
                "FIXED by the pallas_packed variant "
                "(ops/linearize_pallas.py): plane-major (24,n) in/out "
                "moves 192 B/eval (1.2x payload), and is the headline "
                "row. fused_analytic is the XLA closed-form kernel the "
                "f64 production path uses; generic_jacfwd is the fallback "
                "for the long tail of factor types."
            ),
        ),
        rows=rows,
        variants=all_rows,
    )
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(doc, fh, indent=1)
    print(json.dumps(doc))
    return doc


if __name__ == "__main__":
    out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None
    main(out)
    os._exit(0)
