"""Incremental + fixed-lag solve benchmark on the real device.

Captures the reference's incremental re-solve story
(/root/reference/examples/ManhattanDatasetIncremental.jl:97-115 per-step
timing + clique-recycle counters; fixed-lag testFixedLagFG.jl:34-121) as a
committed artifact: per-step solve latency, XLA compile count per step (the
shape-bucket reuse signal — within a bucket the compiled LM program is
recycled, the TPU analogue of solveTree! tree recycling), and fixed-lag
frozen-pose bit-stability.

Writes INCREMENTAL_r04.json. Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/incremental_bench.py
"""
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rome_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_log_compiles", True)

MANHATTAN = "/root/reference/examples/manhattan.g2o"


class CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.count = 0

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compiling" in msg:
            self.count += 1


def run_incremental(instructions, stride=10, out_rows=None):
    from rome_tpu import (
        FactorGraph, GNOptions, MvNormal, Pose2, PriorPose2,
        solve_graph_parametric,
    )
    from rome_tpu.io.g2o import parse_g2o_instruction

    counter = CompileCounter()
    logging.getLogger("jax").addHandler(counter)
    fg = FactorGraph()
    fg.params.graphinit = False
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    fg.init_variable("x0", [0.0, 0.0, 0.0])
    opts = GNOptions(max_iters=15)
    rows = out_rows if out_rows is not None else []
    for i, ins in enumerate(instructions):
        parse_g2o_instruction(fg, ins, initialize=True)
        if (i + 1) % stride == 0:
            c0 = counter.count
            t0 = time.time()
            res = solve_graph_parametric(
                fg, init=False, options=opts, chordal_init=False, pad=True
            )
            dt = time.time() - t0
            st = res["stats"]
            rows.append(
                dict(
                    step=i + 1,
                    n_vars=fg.num_variables,
                    n_factors=fg.num_factors,
                    solve_s=round(dt, 4),
                    iters=st.iterations,
                    converged=st.converged,
                    final_cost=round(st.final_cost, 6),
                    compiles=counter.count - c0,
                )
            )
            print(json.dumps(rows[-1]), flush=True)
    logging.getLogger("jax").removeHandler(counter)
    return rows


def run_fixedlag(instructions, qfl=25, stride=10):
    from rome_tpu import (
        FactorGraph, GNOptions, MvNormal, Pose2, PriorPose2,
        solve_graph_parametric,
    )
    from rome_tpu.frontend.robot_utils import fifo_freeze
    from rome_tpu.io.g2o import parse_g2o_instruction

    fg = FactorGraph()
    fg.params.graphinit = False
    fg.params.qfl = qfl
    fg.params.isfixedlag = True
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    fg.init_variable("x0", [0.0, 0.0, 0.0])
    opts = GNOptions(max_iters=15)
    rows = []
    frozen_checkpoint = {}
    max_drift = 0.0
    for i, ins in enumerate(instructions):
        parse_g2o_instruction(fg, ins, initialize=True)
        if (i + 1) % stride == 0:
            fifo_freeze(fg)
            t0 = time.time()
            res = solve_graph_parametric(
                fg, init=False, options=opts, chordal_init=False, pad=True
            )
            dt = time.time() - t0
            drift = 0.0
            for lbl, prev in frozen_checkpoint.items():
                drift = max(
                    drift, float(np.abs(fg.get_coords(lbl) - prev).max())
                )
            max_drift = max(max_drift, drift)
            for lbl in fg.ls(r"^x\d+$"):
                if fg.variables[lbl].solvable == 0:
                    frozen_checkpoint[lbl] = fg.get_coords(lbl).copy()
            n_frozen = sum(
                fg.variables[l].solvable == 0 for l in fg.ls(r"^x\d+$")
            )
            rows.append(
                dict(
                    step=i + 1, n_vars=fg.num_variables, n_frozen=n_frozen,
                    solve_s=round(dt, 4), frozen_drift=drift,
                    iters=res["stats"].iterations,
                )
            )
            print(json.dumps(rows[-1]), flush=True)
    return rows, max_drift


def main():
    from rome_tpu.io.g2o import import_g2o

    n_ins = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    instructions = import_g2o(MANHATTAN)[:n_ins]
    dev = str(jax.devices()[0])
    print("device:", dev, flush=True)

    t0 = time.time()
    inc_rows = run_incremental(instructions)
    inc_wall = time.time() - t0
    t0 = time.time()
    fl_rows, max_drift = run_fixedlag(instructions)
    fl_wall = time.time() - t0

    # summarize bucket reuse: steps with zero compiles = recycled program
    recycled = sum(1 for r in inc_rows if r["compiles"] == 0)
    steady = [r["solve_s"] for r in inc_rows if r["compiles"] == 0]
    out = dict(
        device=dev,
        workload=f"manhattan.g2o first {n_ins} instructions, stride 10",
        incremental=dict(
            rows=inc_rows,
            wall_s=round(inc_wall, 2),
            steps=len(inc_rows),
            steps_recycled_program=recycled,
            recycle_rate=round(recycled / max(1, len(inc_rows)), 3),
            steady_step_latency_s=dict(
                median=round(float(np.median(steady)), 4) if steady else None,
                p90=round(float(np.percentile(steady, 90)), 4) if steady else None,
            ),
        ),
        fixedlag=dict(
            rows=fl_rows,
            wall_s=round(fl_wall, 2),
            qfl=25,
            max_frozen_drift=max_drift,
            bit_stable=bool(max_drift == 0.0),
        ),
        note=(
            "compiles column counts XLA compilations during that step "
            "(jax_log_compiles listener); 0 = the shape-bucketed compiled "
            "LM program was reused — the TPU analogue of the reference's "
            "solveTree! clique recycling "
            "(ManhattanDatasetIncremental.jl:112-115)."
        ),
    )
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "INCREMENTAL_r04.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    print("wrote INCREMENTAL_r04.json", flush=True)


if __name__ == "__main__":
    main()
