"""Generate the third accuracy-gated bench dataset: a 10k-pose city grid at
a 10x metric scale (10 m blocks vs Manhattan's ~1 m edges).

Purpose (round 5): the solver config must not be tuned to any single
dataset's metric scale — M3500 and MIT are both ~1 m-edge graphs, so a
dtol/chordal-tol valley shaped by them would go undetected. This dataset
moves every length scale by 10x (block length, odometry noise, loop-closure
radius); the bench gates scale with the dataset's median edge length, and
one SolverParams config must pass all three.

Writes data/citygrid.g2o (EDGE_SE2 format, reference g2o grammar) and then
the caller runs tools/cpu_reference.py to produce data/citygrid_gt.npz.

Reference analogue: examples/ManhattanDatasetBatch.jl workload family.
"""

import os
import sys

import numpy as np

BLOCK = 10.0           # grid block length (m) — 10x the Manhattan scale
SIGMA_T = 0.15         # odometry translation noise (m)
SIGMA_R = 0.008        # odometry rotation noise (rad)
LC_SIGMA_T = 0.10      # loop-closure translation noise (m)
LC_SIGMA_R = 0.005
LC_RADIUS = 3.0        # true-position re-visit radius (m)
LC_MIN_SEP = 30        # minimum pose-index separation for a closure
LC_PROB = 0.85         # probability of adding an available closure
# closure density tuned so the posterior is STIFF: at the original 0.25 /
# sep 60 the optimum had near-flat long-wavelength modes — our solve and
# the f64 reference landed 23 m apart at a cost gap of 2e-5 relative,
# making any position-space accuracy gate ill-conditioned


def wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def se2_between(a, b):
    """Relative pose a^-1 * b as (dx, dy, dth) in a's frame."""
    c, s = np.cos(a[2]), np.sin(a[2])
    d = b[:2] - a[:2]
    return np.array(
        [c * d[0] + s * d[1], -s * d[0] + c * d[1], wrap(b[2] - a[2])]
    )


def generate(n_poses=10_000, seed=7):
    rng = np.random.default_rng(seed)
    poses = np.zeros((n_poses, 3))
    # grid random walk: go straight 1-4 blocks, then turn +-90 deg
    th = 0.0
    p = np.zeros(2)
    i = 1
    poses[0] = [0.0, 0.0, 0.0]
    while i < n_poses:
        run = int(rng.integers(1, 5))
        for _ in range(run):
            if i >= n_poses:
                break
            p = p + BLOCK * np.array([np.cos(th), np.sin(th)])
            poses[i] = [p[0], p[1], th]
            i += 1
        th = wrap(th + rng.choice([-1.0, 1.0]) * np.pi / 2)

    edges = []
    info_t = 1.0 / SIGMA_T**2
    info_r = 1.0 / SIGMA_R**2
    for j in range(1, n_poses):
        z = se2_between(poses[j - 1], poses[j])
        z = z + rng.normal(0, [SIGMA_T, SIGMA_T, SIGMA_R])
        edges.append((j - 1, j, z, info_t, info_r))

    # loop closures on true-position revisits (grid cells hash)
    cell = {}
    lc_info_t = 1.0 / LC_SIGMA_T**2
    lc_info_r = 1.0 / LC_SIGMA_R**2
    n_lc = 0
    for j in range(n_poses):
        key = (round(poses[j, 0] / BLOCK), round(poses[j, 1] / BLOCK))
        for k in cell.get(key, []):
            if (
                j - k >= LC_MIN_SEP
                and np.linalg.norm(poses[j, :2] - poses[k, :2]) < LC_RADIUS
                and rng.random() < LC_PROB
            ):
                z = se2_between(poses[k], poses[j])
                z = z + rng.normal(0, [LC_SIGMA_T, LC_SIGMA_T, LC_SIGMA_R])
                edges.append((k, j, z, lc_info_t, lc_info_r))
                n_lc += 1
        cell.setdefault(key, []).append(j)

    return poses, edges, n_lc


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "citygrid.g2o",
    )
    poses, edges, n_lc = generate(n)
    with open(out, "w") as fh:
        for i, p in enumerate(poses):
            fh.write(
                f"VERTEX_SE2 {i} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n"
            )
        for a, b, z, it, ir in edges:
            # info matrix diag(it, it, ir): upper-triangle row-major order
            # I11 I12 I13 I22 I23 I33 (g2o EDGE_SE2 grammar)
            fh.write(
                f"EDGE_SE2 {a} {b} {z[0]:.6f} {z[1]:.6f} {z[2]:.6f} "
                f"{it:.6f} 0 0 {it:.6f} 0 {ir:.6f}\n"
            )
    print(
        f"wrote {out}: {n} poses, {len(edges)} edges "
        f"({n_lc} loop closures), block {BLOCK} m"
    )


if __name__ == "__main__":
    main()
