"""Manhattan fixed-lag (sliding window) solve driver.

Mirrors /root/reference/examples/ManhattanDatasetFixedLag*.jl: incremental
parse with a quasi-fixed-lag window — poses older than ``qfl`` are frozen
(solvable=0, marginalized) via fifo_freeze and keep their estimates
bit-stable across subsequent solves (testFixedLagFG.jl:115 semantics).

    python examples/manhattan_fixedlag.py [g2o_path] [max_instructions] [qfl]
"""

import sys
import time

import numpy as np

from rome_tpu import FactorGraph, GNOptions, MvNormal, Pose2, PriorPose2, solve_graph_parametric
from rome_tpu.frontend.robot_utils import fifo_freeze
from rome_tpu.io.g2o import import_g2o, parse_g2o_instruction

DEFAULT = "/root/reference/examples/manhattan.g2o"


def main(path=DEFAULT, max_instructions="300", qfl="25"):
    max_instructions, qfl = int(max_instructions), int(qfl)
    instructions = import_g2o(path)[:max_instructions]

    fg = FactorGraph()
    fg.params.graphinit = False
    fg.params.qfl = qfl
    fg.params.isfixedlag = True
    fg.add_variable("x0", Pose2)
    fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])))
    fg.init_variable("x0", [0.0, 0.0, 0.0])

    opts = GNOptions(max_iters=15)
    frozen_checkpoint = {}
    for i, ins in enumerate(instructions):
        parse_g2o_instruction(fg, ins, initialize=True)
        if (i + 1) % 10 == 0:
            fifo_freeze(fg)
            t0 = time.time()
            solve_graph_parametric(fg, init=False, options=opts, chordal_init=False)
            dt = time.time() - t0
            # frozen poses must be bit-stable across solves
            drift = 0.0
            for lbl, prev in frozen_checkpoint.items():
                drift = max(drift, float(np.abs(fg.get_coords(lbl) - prev).max()))
            for lbl in fg.ls(r"^x\d+$"):
                if fg.variables[lbl].solvable == 0:
                    frozen_checkpoint[lbl] = fg.get_coords(lbl).copy()
            n_frozen = sum(fg.variables[l].solvable == 0 for l in fg.ls(r"^x\d+$"))
            print(f"step {i + 1}: {fg.num_variables} vars ({n_frozen} frozen), "
                  f"solve {dt:.3f}s, frozen-drift={drift:.2e}")


if __name__ == "__main__":
    main(*sys.argv[1:])
