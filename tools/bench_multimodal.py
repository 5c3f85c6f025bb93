"""Multimodal (nonparametric) engine perf bench.

Workloads:
- hexagonal fixture, N=100 particles, 3 sweeps (the reference's canonical
  warmup solve, GenerateHexagonal.jl:27-42)
- beehive 100 poses, N=100 (testBeehiveGrow.jl scale)

Reports first-call (compile) and steady-state (structure-cached) wall time
for the compiled batched engine, plus the per-factor host-loop engine for
comparison (the round-1 architecture). Writes MULTIMODAL_r{N}.json.

Usage: python tools/bench_multimodal.py [out.json] [cpu|device]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hex():
    from rome_tpu.canonical.generators import generate_graph_hexagonal

    return generate_graph_hexagonal(N=100)


def _beehive():
    from rome_tpu.canonical.patterns import generate_graph_beehive

    return generate_graph_beehive(pose_count_target=100, graphinit=False)


def _solve(fg, engine):
    from rome_tpu.solvers.multimodal import solve_graph_nonparametric

    t0 = time.time()
    solve_graph_nonparametric(fg, sweeps=3, N=100, engine=engine)
    return time.time() - t0


def main(out="MULTIMODAL_r02.json", platform="cpu"):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    rows = {}
    for name, make in (("hexagonal_7pose", _hex), ("beehive_100pose", _beehive)):
        t_first = _solve(make(), "batched")
        t_steady = _solve(make(), "batched")  # structure-cached reuse
        row = dict(
            batched_first_s=round(t_first, 2),
            batched_steady_s=round(t_steady, 2),
        )
        if name == "hexagonal_7pose":
            row["loop_engine_s"] = round(_solve(make(), "loop"), 2)
            row["speedup_steady_vs_loop"] = round(
                row["loop_engine_s"] / max(t_steady, 1e-9), 1
            )
        rows[name] = row
        print(name, rows[name], flush=True)

    doc = dict(device=str(jax.devices()[0]), N=100, sweeps=3, rows=rows)
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "MULTIMODAL_r02.json",
        sys.argv[2] if len(sys.argv) > 2 else "cpu",
    )
