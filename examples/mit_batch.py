"""MIT dataset batch solve driver.

Mirrors /root/reference/examples/MITDatasetBatch.jl (827-edge MIT g2o).

    python examples/mit_batch.py [path/to/MIT.g2o]
"""

import sys
import time

from rome_tpu import GNOptions, MvNormal, PriorPose2, solve_graph_parametric
from rome_tpu.io.g2o import load_g2o
from rome_tpu.io.serialization import save_dfg

DEFAULT = "/root/reference/examples/MIT.g2o"


def main(path=DEFAULT):
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
    print(f"solved in {dt:.2f}s: {st.iterations} iters, cost={st.final_cost:.2f}")
    save_dfg(fg, "/tmp/mit_solved")
    # result figure (RoMEPlotting plotSLAM2D analogue,
    # MITDatasetBatch.jl:46-50)
    try:
        from rome_tpu.services.plotting import plot_slam2d

        plot_slam2d(fg, path="/tmp/mit_slam2d.png", title="MIT batch solve")
        print("wrote /tmp/mit_slam2d.png")
    except Exception as e:  # matplotlib optional at runtime
        print("plot skipped:", e)


if __name__ == "__main__":
    main(*sys.argv[1:])
