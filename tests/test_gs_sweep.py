"""Sequential Gauss-Seidel scan sweep (the up/down analogue of the
reference's clique-ordered solveTree! pass, Slam.jl:236-261).

Covers: host routing (chronological order + up-message masks), and the
compiled scan pass itself (runs, respects free masks, keeps accuracy when
seeded at the parametric optimum)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


@pytest.fixture(scope="module")
def beehive():
    from rome_tpu.canonical.patterns import generate_graph_beehive

    return generate_graph_beehive(pose_count_target=10, graphinit=False)


def test_gs_routing_up_masks(beehive):
    from rome_tpu.solvers.multimodal.batched import (
        BatchedNonparametricSolver, _build_gs_routing,
    )

    solver = BatchedNonparametricSolver(beehive, "default", N=20)
    routing = _build_gs_routing(solver.bp, beehive)
    assert routing is not None
    ga = solver.ga
    # the global order covers every lowered variable exactly once
    assert routing["order"].shape == (
        sum(ga.counts[t] for t in ga.type_names), 2,
    )
    # odometry stream semantics: the message into the LATER pose is an
    # up message; the reverse direction is not
    for si_local, si in enumerate(routing["S"]["Pose2"]):
        src = solver.bp.sources[si]
        b = ga.batches[src.b]
        if b.ftype.name != "Pose2Pose2":
            continue
        vsl = np.asarray(b.vslots)
        for i in range(b.n):
            v, k = int(src.dest_var[i]), int(src.dest_k[i])
            other = vsl[i, 1 - src.s]
            expect = 1.0 if other < v else 0.0  # pose slots are chronologic
            assert routing["up_of"]["Pose2"][v, k] == expect


def test_gs_pass_runs_and_preserves_truth(beehive):
    from rome_tpu import solve_graph_parametric
    from rome_tpu.solvers.multimodal.batched import BatchedNonparametricSolver

    fg = beehive
    fg.init_all()
    solve_graph_parametric(fg, init=False)
    truth = {l: fg.get_coords(l, "parametric") for l in fg.ls(r"^x\d+$")}

    solver = BatchedNonparametricSolver(fg, "default", N=30)
    key = jax.random.PRNGKey(0)
    solver.init_beliefs_from_points(jax.random.fold_in(key, 0))
    beliefs = solver.gather_beliefs()
    # all-message (smoothing) passes: the anchored GS form used by solve()
    out = solver.gs_pass(beliefs, jax.random.fold_in(key, 1), up_only=False)
    assert out is not None
    out = solver.gs_pass(out, jax.random.fold_in(key, 2), up_only=False,
                         reverse=True)
    arr = np.asarray(out["Pose2"])
    assert np.isfinite(arr).all()
    errs = [
        np.linalg.norm(arr[s, :, :2].mean(0) - truth[l][:2])
        for s, l in enumerate(solver.ga.var_labels["Pose2"])
    ]
    # seeded at the optimum, the smoothing equilibrium stays near it (the
    # KDE product adds kernel-bandwidth jitter, hence the loose band)
    assert float(np.mean(errs)) < 1.0
