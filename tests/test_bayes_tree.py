"""Bayes tree tests (reference: buildTreeFromOrdering! usage at
testDeadReckoningTether.jl:56-60, tree recycling at testBeehiveGrow.jl:20-28,
clique-by-clique solve at testHexagonal2D_CliqByCliq.jl).
"""

import numpy as np
import pytest

from rome_tpu import FactorGraph, MvNormal, Normal, Pose2, Pose2Pose2, PriorPose2
from rome_tpu.canonical.generators import generate_graph_hexagonal
from rome_tpu.solvers.multimodal.tree import (
    build_tree_from_ordering,
    calc_cliques_recycled,
    get_elimination_order,
    solve_tree,
)


def _chain(n=5):
    fg = FactorGraph()
    fg.params.N = 50
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    for i in range(1, n):
        fg.add_variable(f"x{i}", Pose2)
        fg.add_factor(
            [f"x{i-1}", f"x{i}"], Pose2Pose2(MvNormal([1, 0, 0], np.eye(3) * 0.01))
        )
    return fg


def test_elimination_order_covers_all():
    fg = generate_graph_hexagonal()
    order = get_elimination_order(fg)
    assert sorted(order) == sorted(fg.ls())
    # constraint goes last (near root)
    order2 = get_elimination_order(fg, constraints=["x0"])
    assert order2[-1] == "x0"


def test_tree_structure_chain():
    fg = _chain(5)
    tree = build_tree_from_ordering(fg)
    # every variable is frontal in exactly one clique
    frontals = [v for c in tree.cliques for v in c.frontals]
    assert sorted(frontals) == sorted(fg.ls())
    # chain tree: separators are single variables, tree is a path
    for c in tree.cliques:
        assert len(c.separator) <= 1
    # every factor assigned exactly once
    fassigned = [f for c in tree.cliques for f in c.factors]
    assert sorted(fassigned) == sorted(fg.lsf())
    # levels cover all cliques
    assert sorted(i for level in tree.levels for i in level) == list(
        range(tree.num_cliques)
    )


def test_tree_hexagonal_loops():
    fg = generate_graph_hexagonal()
    tree = build_tree_from_ordering(fg)
    frontals = [v for c in tree.cliques for v in c.frontals]
    assert sorted(frontals) == sorted(fg.ls())
    # the loop forces at least one multi-variable separator
    assert any(len(c.separator) >= 2 for c in tree.cliques)


def test_tree_recycling_counts():
    fg = _chain(6)
    tree1 = build_tree_from_ordering(fg)
    # grow the chain by one pose: most cliques unchanged
    fg.add_variable("x6", Pose2)
    fg.add_factor(["x5", "x6"], Pose2Pose2(MvNormal([1, 0, 0], np.eye(3) * 0.01)))
    tree2 = build_tree_from_ordering(fg, old_tree=tree1)
    total, recycled = calc_cliques_recycled(tree2)
    assert recycled > 0
    assert recycled < total


@pytest.mark.slow
def test_solve_tree_chain_accuracy():
    fg = _chain(4)
    tree = solve_tree(fg, N=80)
    assert tree.num_cliques >= 1
    for i in range(4):
        pts = np.asarray(fg.variables[f"x{i}"].beliefs["default"])
        assert pts.shape == (80, 3)
        med = np.median(pts[:, 0])
        assert abs(med - i) < 0.6, (i, med)


@pytest.mark.slow
def test_solve_tree_recycle_resolve():
    """solveTree!(fg, tree) re-solve with recycling (testBeehiveGrow.jl
    pattern)."""
    fg = _chain(4)
    tree = solve_tree(fg, N=60)
    fg.add_variable("x4", Pose2)
    fg.add_factor(["x3", "x4"], Pose2Pose2(MvNormal([1, 0, 0], np.eye(3) * 0.01)))
    tree2 = solve_tree(fg, tree, N=60)
    assert tree2.num_recycled > 0
    med = np.median(np.asarray(fg.variables["x4"].beliefs["default"])[:, 0])
    assert abs(med - 4) < 0.8


def test_maxincidence_guard():
    fg = FactorGraph()
    fg.params.maxincidence = 3
    fg.add_variable("hub", Pose2)
    fg.add_factor(["hub"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    for i in range(6):
        fg.add_variable(f"x{i}", Pose2)
        fg.add_factor(
            ["hub", f"x{i}"], Pose2Pose2(MvNormal([1, 0, 0], np.eye(3) * 0.01))
        )
    with pytest.raises(RuntimeError, match="maxincidence"):
        get_elimination_order(fg)


@pytest.mark.slow
def test_recycled_cliques_bit_identical():
    """True recycling: after appending one pose, ONLY dirty-path cliques
    recompute — every recycled clique's frontal beliefs and point estimates
    are BIT-IDENTICAL across the re-solve (solveTree!(fg, tree) contract,
    testBeehiveGrow.jl:20-28)."""
    fg = _chain(8)
    tree1 = solve_tree(fg, N=60)
    before = {
        v: np.asarray(fg.variables[v].beliefs["default"]).copy()
        for v in fg.ls()
    }
    pts_before = {v: np.asarray(fg.variables[v].points["default"]).copy() for v in fg.ls()}

    fg.add_variable("x8", Pose2)
    fg.add_factor(["x7", "x8"], Pose2Pose2(MvNormal([1, 0, 0], np.eye(3) * 0.01)))
    tree2 = solve_tree(fg, tree1, N=60)
    assert tree2.num_recycled > 0

    recycled_vars = [
        v
        for c in tree2.cliques
        if c.index not in tree2.dirty
        for v in c.frontals
        if v in before
    ]
    assert recycled_vars, "expected at least one recycled clique"
    for v in recycled_vars:
        after = np.asarray(fg.variables[v].beliefs["default"])
        np.testing.assert_array_equal(after, before[v])
        np.testing.assert_array_equal(
            np.asarray(fg.variables[v].points["default"]), pts_before[v]
        )
    # the new pose did get solved
    med = np.median(np.asarray(fg.variables["x8"].beliefs["default"])[:, 0])
    assert abs(med - 8) < 1.0
