"""Manhattan-3500 batch solve driver.

Mirrors /root/reference/examples/ManhattanDatasetBatch.jl: import the g2o,
anchor x0 with a prior, batch-solve parametrically, save the graph.

    python examples/manhattan_batch.py [path/to/manhattan.g2o] [out_dir]
"""

import os
import sys
import time

import numpy as np

from rome_tpu import GNOptions, MvNormal, PriorPose2, solve_graph_parametric
from rome_tpu.io.g2o import load_g2o
from rome_tpu.io.serialization import save_dfg

DEFAULT = "/root/reference/examples/manhattan.g2o"


def main(path=DEFAULT, out_dir="/tmp/manhattan_out"):
    fg = load_g2o(None, path)
    fg.add_factor(
        ["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])), graphinit=False
    )
    fg.init_all()
    n = len(fg.ls(r"^x\d+$"))
    print(f"loaded {n} poses, {fg.num_factors} factors")

    t0 = time.time()
    res = solve_graph_parametric(
        fg, init=False, options=GNOptions(max_iters=50), chordal_init=True
    )
    dt = time.time() - t0
    st = res["stats"]
    print(f"solved in {dt:.2f}s ({n / dt:.1f} poses/s): "
          f"{st.iterations} iters, cost={st.final_cost:.2f}, converged={st.converged}")

    os.makedirs(out_dir, exist_ok=True)
    save_dfg(fg, os.path.join(out_dir, "manhattan_solved"))
    xy = np.stack([fg.get_coords(f"x{i}")[:2] for i in range(n)])
    np.savetxt(os.path.join(out_dir, "trajectory.csv"), xy, delimiter=",")
    print(f"saved graph + trajectory to {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
