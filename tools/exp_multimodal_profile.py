"""TPU phase profile of the beehive-100 nonparametric solve: build / init /
per-sweep (messages vs products vs glue) / scatter. Identifies where the
25.8 s steady state (MULTIMODAL_r03) actually goes on the real device.
"""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from rome_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()
import jax.random as jr

from rome_tpu.canonical.patterns import generate_graph_beehive
from rome_tpu.solvers.multimodal.batched import BatchedNonparametricSolver
from rome_tpu.solvers.multimodal.solve import init_all_beliefs

print("device:", jax.devices()[0], flush=True)

out = {}
for rep in range(2):
    fg = generate_graph_beehive(pose_count_target=100, graphinit=False)
    t0 = time.time()
    solver = BatchedNonparametricSolver(fg, "default", N=100)
    t1 = time.time()
    init_all_beliefs(fg, "default", N=100, key=jr.PRNGKey(0))
    t2 = time.time()
    beliefs = solver.gather_beliefs()
    jax.block_until_ready(beliefs["Pose2"])
    t3 = time.time()
    # one sweep split into messages / glue / products
    key = jr.fold_in(jr.PRNGKey(1), 0)
    bp, ga = solver.bp, solver.ga
    msgs = bp._messages(beliefs, solver._params_all, key)
    jax.block_until_ready(msgs)
    t4 = time.time()
    full = solver.sweep(beliefs, key)
    jax.block_until_ready(full["Pose2"])
    t5 = time.time()
    sw = time.time()
    for s in range(3):
        beliefs = solver.sweep(beliefs, jr.fold_in(jr.PRNGKey(1), s))
    jax.block_until_ready(beliefs["Pose2"])
    t6 = time.time()
    solver.scatter_beliefs(beliefs)
    t7 = time.time()
    out[f"rep{rep}"] = dict(
        build_s=round(t1 - t0, 2),
        init_s=round(t2 - t1, 2),
        gather_s=round(t3 - t2, 2),
        messages_only_s=round(t4 - t3, 2),
        one_full_sweep_s=round(t5 - t4, 2),
        three_sweeps_s=round(t6 - sw, 2),
        scatter_s=round(t7 - t6, 2),
    )
    print(json.dumps(out[f"rep{rep}"]), flush=True)
print(json.dumps(out), flush=True)
