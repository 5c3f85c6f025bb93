"""Hexagonal 2D SLAM — the canonical first example.

Mirrors /root/reference/examples/Hexagonal2D_SLAM.jl: build the hexagonal
fixture (7 poses around a circle, odometry ring, landmark with two
sightings), run both the parametric batch solve and the nonparametric
(multimodal) Bayes-tree solve, and print per-pose estimates against the
:simulated ground-truth PPEs.

Run from the repo root:  python examples/hexagonal2d_slam.py
"""

import numpy as np

from rome_tpu import GNOptions, solve_graph_parametric
from rome_tpu.canonical.generators import generate_graph_hexagonal
from rome_tpu.solvers.multimodal.tree import solve_tree


def main():
    fg = generate_graph_hexagonal()
    fg.init_all()

    # -- parametric batch solve (IIF.solveGraphParametric! analogue) --------
    res = solve_graph_parametric(fg, options=GNOptions(max_iters=50))
    print(f"parametric: {res['stats'].iterations} iters, "
          f"cost={res['stats'].final_cost:.4f}")
    for lbl in fg.ls(r"^x\d+$") + fg.ls(r"^l\d+$"):
        est = fg.get_coords(lbl)
        gt = fg.get_ppe(lbl) if lbl.startswith("x") else None
        line = f"  {lbl}: est={np.round(est, 3)}"
        if gt is not None:
            line += f"  gt={np.round(gt, 3)}  err={np.linalg.norm(est[:2] - gt[:2]):.3f}"
        print(line)

    # -- nonparametric Bayes-tree solve (solveTree! analogue) ---------------
    tree = solve_tree(fg)
    print(f"nonparametric: {tree.num_cliques} cliques")
    for lbl in fg.ls(r"^x\d+$"):
        pts = np.asarray(fg.variables[lbl].beliefs["default"])
        print(f"  {lbl}: belief mean={np.round(pts.mean(axis=0), 3)} "
              f"std={np.round(pts.std(axis=0), 3)}")


if __name__ == "__main__":
    main()
