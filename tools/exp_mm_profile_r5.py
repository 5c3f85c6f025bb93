"""TPU phase profile of the beehive-100 points_init nonparametric solve
with SCALAR-FETCH fences (jax.block_until_ready does not block over the
tunneled device — r4 profiles misattributed phase time via dispatch
backpressure)."""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from rome_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import jax.random as jr

from rome_tpu.canonical.patterns import generate_graph_beehive
from rome_tpu.solvers.multimodal.batched import BatchedNonparametricSolver

print("device:", jax.devices()[0], flush=True)


def fence(x):
    return float(jnp.sum(x))


out = {}
for rep in range(2):
    fg = generate_graph_beehive(pose_count_target=100, graphinit=False)
    t0 = time.time()
    solver = BatchedNonparametricSolver(fg, "default", N=100)
    t1 = time.time()
    solver.init_beliefs_from_points(jr.PRNGKey(0))
    t2 = time.time()
    beliefs = solver.gather_beliefs()
    fence(beliefs["Pose2"])
    t3 = time.time()
    key = jr.PRNGKey(1)
    b = beliefs
    for s in range(3):
        b = solver.sweep(b, jr.fold_in(key, s))
    fence(b["Pose2"])
    t4 = time.time()
    solver.scatter_beliefs(b)
    # surface means (the solve() tail)
    from rome_tpu.solvers.multimodal.kde import manifold_mean
    import numpy as np

    for t in solver.ga.type_names:
        man = solver.ga.manifolds[t]
        mus = jax.vmap(lambda p: manifold_mean(man, p))(b[t])
        mus = np.asarray(mus)
    t5 = time.time()
    out[f"rep{rep}"] = dict(
        build_s=round(t1 - t0, 2),
        points_init_s=round(t2 - t1, 2),
        gather_s=round(t3 - t2, 2),
        three_sweeps_s=round(t4 - t3, 2),
        scatter_means_s=round(t5 - t4, 2),
        total_s=round(t5 - t0, 2),
    )
    print(json.dumps(out[f"rep{rep}"]), flush=True)
os._exit(0)
