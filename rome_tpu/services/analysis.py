"""Bearing-range prediction, Mahalanobis gating, simulation helpers, and
graph-comparison analysis tools.

Reference: /root/reference/src/services/BearingRangeUtils.jl (predictBodyBR
:3-20, malahanobisBR :23-37, predictVariableByFactor :67-91),
SimulationUtils.jl (simOdo! :11-25, calcPosePointBearingRange :47-61),
FactorGraphAnalysisTools.jl (rangeErrMaxPoint2 :4-8, rangeCompAllPoses
:10-32, compareDensity :37-49), ManifoldUtils.jl (homography converters
:6-21).
"""

from __future__ import annotations

import numpy as np

from rome_tpu.distributions import Distribution, MvNormal, Normal
from rome_tpu.graph.graph import FactorGraph
from rome_tpu.utils.host import host_default_device
from rome_tpu.utils.math import sym_rem_np


# ----------------------- bearing-range prediction ---------------------------

def _best_coords(fg: FactorGraph, label: str, solve_key=None):
    """Max/mean belief coords of a variable: KDE mean if particles exist,
    else the parametric point."""
    rec = fg.variables[str(label)]
    keys = [solve_key] if solve_key else ["default", "parametric"]
    for k in keys:
        if k in rec.beliefs:
            pts = np.asarray(rec.beliefs[k], dtype=np.float64)
            with host_default_device():
                return np.asarray(rec.manifold.log(pts)).mean(axis=0)
    for k in keys + list(rec.points):
        if k in rec.points:
            with host_default_device():
                return np.asarray(rec.manifold.log(np.asarray(rec.points[k])))
    raise KeyError(f"{label} has no belief or point")


def predict_body_br(fg: FactorGraph, a: str, b: str, solve_key=None):
    """predictBodyBR (BearingRangeUtils.jl:3-20): (bearing, range) of
    variable b seen from pose a's body frame, at current max beliefs."""
    A = _best_coords(fg, a, solve_key)
    B = _best_coords(fg, b, solve_key)
    dx, dy = B[0] - A[0], B[1] - A[1]
    c, s = np.cos(A[2]), np.sin(A[2])
    bx = c * dx + s * dy
    by = -s * dx + c * dy
    return float(np.arctan2(by, bx)), float(np.hypot(bx, by))


def mahalanobis_br(meas, pred, cov):
    """Mahalanobis distance between measured and predicted (bearing, range)
    (BearingRangeUtils.jl:23-37 — the reference exports this under the
    misspelling ``malahanobisBR``; we keep that spelling as a compat alias
    below)."""
    res = np.asarray(meas, dtype=np.float64) - np.asarray(pred, dtype=np.float64)
    return float(np.sqrt(res @ np.linalg.solve(np.asarray(cov, dtype=np.float64), res)))


malahanobis_br = mahalanobis_br  # reference-parity alias (sic)


def calc_pose_point_bearing_range(pose, point):
    """calcPosePointBearingRange (SimulationUtils.jl:47-61)."""
    pose = np.asarray(pose, dtype=np.float64).reshape(3)
    point = np.asarray(point, dtype=np.float64).reshape(2)
    dd = point - pose[:2]
    rng = float(np.linalg.norm(dd))
    the = float(sym_rem_np(np.arctan2(dd[1], dd[0]) - pose[2]))
    return the, rng


def predict_variable_by_factor(fg: FactorGraph, targetsym: str, fct, prevars):
    """predictVariableByFactor (BearingRangeUtils.jl:67-91): evaluate a NOT
    yet added factor by building a temp graph and convolving through it.
    Returns (current_particles, predicted_particles) for data-association
    decisions (multihypo gating)."""
    from rome_tpu.solvers.multimodal.convolve import approx_conv

    targetsym = str(targetsym)
    assert targetsym in [str(v) for v in prevars]
    tfg = FactorGraph()
    tfg.params.N = fg.params.N
    tfg.params.graphinit = False
    for var in prevars:
        var = str(var)
        rec = fg.variables[var]
        nrec = tfg.add_variable(var, rec.vtype, timestamp_ns=rec.timestamp_ns)
        if var != targetsym:
            nrec.points = dict(rec.points)
            nrec.beliefs = dict(rec.beliefs)
            nrec.initialized = dict(rec.initialized)
    f = tfg.add_factor([str(v) for v in prevars], fct, graphinit=False)
    pred = np.asarray(approx_conv(tfg, f.label, targetsym))
    rec = fg.variables[targetsym]
    curr = np.asarray(
        rec.beliefs.get(
            "default",
            np.broadcast_to(
                rec.points.get("parametric", np.asarray(rec.manifold.identity())),
                (fg.params.N, rec.vtype.point_dim),
            ),
        )
    )
    return curr, pred


# ----------------------------- simulation -----------------------------------

def sim_odo(
    fg_gt: FactorGraph,
    fg: FactorGraph,
    DX,
    noiserate=(6e-2, 6e-2, 3e-3),
    driftrate=(0.0, 0.0, 0.0),
    rng=None,
):
    """simOdo! (SimulationUtils.jl:11-25): drive ground-truth and noisy twin
    graphs with one odometry delta; returns the new pose label."""
    from rome_tpu.factors.pose2 import Pose2Pose2
    from rome_tpu.frontend.odometry import add_odo_fg

    rng = rng or np.random.default_rng()
    DX = np.asarray(DX, dtype=np.float64)
    r = float(np.linalg.norm(DX[:2]))
    add_odo_fg(fg_gt, Pose2Pose2(MvNormal(DX, np.eye(3) * 0.001)))
    nr = np.asarray(noiserate) * r
    cov = np.diag(np.maximum(nr, 1e-9) ** 2)
    DXn = DX + nr * rng.standard_normal(3) + r * np.asarray(driftrate)
    label = add_odo_fg(fg, Pose2Pose2(MvNormal(DXn, cov)))
    return label


# ------------------------------ analysis ------------------------------------

def range_err_max_point2(fg1: FactorGraph, id1, fg2: FactorGraph, id2):
    """rangeErrMaxPoint2 (FactorGraphAnalysisTools.jl:4-8)."""
    a = _best_coords(fg1, id1)
    b = _best_coords(fg2, id2)
    return float(np.linalg.norm(a[:2] - b[:2]))


def range_comp_all_poses(fg1: FactorGraph, fg2: FactorGraph, regex=r"^x\d+$"):
    """rangeCompAllPoses (FactorGraphAnalysisTools.jl:10-32)."""
    out = []
    for label in fg1.ls(regex):
        if label in fg2.variables:
            out.append(range_err_max_point2(fg1, label, fg2, label))
    return np.asarray(out)


def compare_density(a: Distribution, b: Distribution, tol: float = 1e-10) -> bool:
    """compareDensity (FactorGraphAnalysisTools.jl:37-49 + DynPose2D.jl
    compare): same family, same mean/cov within tol."""
    if type(a) is not type(b):
        return False
    if isinstance(a, Normal):
        return abs(a.mu - b.mu) < tol and abs(a.sigma - b.sigma) < tol
    if isinstance(a, MvNormal):
        return (
            float(np.linalg.norm(a.mean() - b.mean())) < tol
            and float(np.abs(a.cov() - b.cov()).sum()) < tol
        )
    return bool(
        np.linalg.norm(np.asarray(a.mean()) - np.asarray(b.mean())) < tol
        and np.linalg.norm(np.asarray(a.cov()) - np.asarray(b.cov())) < tol
    )


# -------------------------- homography converters ---------------------------

def homography_to_coordinates(pHq):
    """SE(3) 4x4 homography -> hybrid coords [t(3), w(3)]
    (ManifoldUtils.jl:6-13)."""
    from rome_tpu.manifolds import quat as Q
    import jax.numpy as jnp

    pHq = np.asarray(pHq, dtype=np.float64)
    with host_default_device():
        w = np.asarray(Q.qlog(Q.qfrom_matrix(jnp.asarray(pHq[:3, :3]))))
    return np.concatenate([pHq[:3, 3], w])


def coordinates_to_homography(pCq):
    """Hybrid coords [t(3), w(3)] -> SE(3) 4x4 homography
    (ManifoldUtils.jl:15-21)."""
    from rome_tpu.manifolds import quat as Q
    import jax.numpy as jnp

    pCq = np.asarray(pCq, dtype=np.float64).reshape(6)
    with host_default_device():
        R = np.asarray(Q.qto_matrix(Q.qexp(jnp.asarray(pCq[3:6]))))
    H = np.eye(4)
    H[:3, :3] = R
    H[:3, 3] = pCq[:3]
    return H


# reference-style aliases
predictBodyBR = predict_body_br
malahanobisBR = malahanobis_br
calcPosePointBearingRange = calc_pose_point_bearing_range
predictVariableByFactor = predict_variable_by_factor
simOdo = sim_odo
rangeErrMaxPoint2 = range_err_max_point2
rangeCompAllPoses = range_comp_all_poses
compareDensity = compare_density
