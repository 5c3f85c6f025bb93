"""Legacy 2015-era inertial preintegration factor (InertialPose3).

Reference: /root/reference/src/factors/InertialPose3.jl:4-313 — the
zeta-embedding formulation: a 30-vector embedding of both 15-dof states
(position, Euler attitude, velocity, gyro bias, accel bias) mapped through
L and C1 Taylor matrices to predict the preintegral delta (eqs 4.21/4.22 of
the original dissertation), with a 15-dof residual against the preintegrated
measurement. Replaced by IMUDeltaFactor in v0.24 (NEWS.md:7) but still
shipped; provided here for the same compatibility reason.

The reference's thread-indexed reuse containers (InertialPose3.jl:147-157)
have no analogue — the residual is a pure function the solvers vmap.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rome_tpu.distributions import Distribution, MvNormal
from rome_tpu.factors.base import Factor, FactorType, gaussian_params, register_factor_type
from rome_tpu.manifolds.base import ProductGroup, SO2_, T3
from rome_tpu.variables import VariableType, register_variable_type

# 15-coord legacy state: [pos(3), euler rpy(3, wrapped), vel(3), bw(3), ba(3)]
InertialPose3V = register_variable_type(
    VariableType(
        "InertialPose3",
        ProductGroup([T3, SO2_, SO2_, SO2_, T3, T3, T3], name="InertialPose3_M"),
    )
)


def _euler_to_R(rpy):
    """TransformUtils Euler(roll, pitch, yaw) convention: R = Rz Ry Rx."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
            jnp.stack([-sp, cp * sr, cp * cr], -1),
        ],
        -2,
    )


def _so3_log(R):
    """vee(log(R)) via the quaternion path (Taylor-guarded)."""
    from rome_tpu.manifolds import quat as Q

    return Q.qlog(Q.qfrom_matrix(R))


def _zeta_embedding(posei, posej, grav):
    """zetaEmbedding (InertialPose3.jl:61-74): 30-vector of both states."""
    Ri = _euler_to_R(posei[..., 3:6])
    Rj = _euler_to_R(posej[..., 3:6])
    dlog = _so3_log(jnp.swapaxes(Ri, -1, -2) @ Rj)
    return jnp.concatenate(
        [
            dlog,                   # 1:3   log(Ri' Rj)
            posej[..., 9:12],       # 4:6   bwj
            posej[..., 6:9],        # 7:9   vj
            posej[..., 0:3],        # 10:12 pj
            posej[..., 12:15],      # 13:15 baj
            posei[..., 9:12],       # 16:18 bwi
            posei[..., 6:9],        # 19:21 vi
            posei[..., 0:3],        # 22:24 pi
            posei[..., 12:15],      # 25:27 bai
            grav,                   # 28:30
        ],
        axis=-1,
    )


def _construct_L(biRw, Dt):
    """constructL (InertialPose3.jl:77-88)."""
    L = jnp.zeros((15, 30), dtype=biRw.dtype)
    eye = jnp.eye(3, dtype=biRw.dtype)
    L = L.at[0:3, 0:3].set(eye)
    L = L.at[6:9, 6:9].set(biRw)
    L = L.at[9:12, 9:12].set(biRw)
    L = L.at[6:9, 18:21].set(-biRw)
    L = L.at[9:12, 18:21].set(-biRw * Dt)
    L = L.at[9:12, 21:24].set(-biRw)
    return L


def _construct_C1(biRw, picg, Dt):
    """constructC1 (InertialPose3.jl:91-107)."""
    C1 = jnp.zeros((15, 30), dtype=biRw.dtype)
    eye = jnp.eye(3, dtype=biRw.dtype)
    g1 = -biRw * Dt
    g2 = 0.5 * g1 * Dt
    C1 = C1.at[3:6, 3:6].set(eye)
    C1 = C1.at[12:15, 12:15].set(eye)
    C1 = C1.at[3:6, 15:18].set(-eye)
    C1 = C1.at[12:15, 24:27].set(-eye)
    C1 = C1.at[6:9, 27:30].set(g1)
    C1 = C1.at[9:12, 27:30].set(g2)
    C1 = C1.at[0:3, 15:18].set(picg["dRdDw"])
    C1 = C1.at[6:9, 15:18].set(picg["dVdDw"])
    C1 = C1.at[9:12, 15:18].set(picg["dPdDw"])
    C1 = C1.at[6:9, 24:27].set(picg["dVdDa"])
    C1 = C1.at[9:12, 24:27].set(picg["dPdDa"])
    return C1


def _inertialpose3_res(params, posei, posej):
    """residual! (InertialPose3.jl:125-133): preintMeas - (L - C1) zeta."""
    grav = params["gravity"]
    zeta = _zeta_embedding(posei, posej, grav)
    biRw = jnp.swapaxes(_euler_to_R(posei[..., 3:6]), -1, -2)
    Dt = params["dt"]
    picg = {
        k: params[k] for k in ("dRdDw", "dVdDw", "dPdDw", "dVdDa", "dPdDa")
    }
    LC = _construct_L(biRw, Dt) - _construct_C1(biRw, picg, Dt)
    pred = LC @ zeta
    return params["pi_meas"] - pred


INERTIAL_POSE3 = register_factor_type(
    FactorType(
        name="InertialPose3",
        variable_types=(InertialPose3V, InertialPose3V),
        zdim=15,
        residual=_inertialpose3_res,
        coord_types=("e",) * 3 + ("c",) * 3 + ("e",) * 9,
        doc="Legacy zeta-embedding inertial preintegration factor "
        "(InertialPose3.jl:125-133, 163-210).",
    )
)


def InertialPose3(Zij: Distribution, pioc: dict, picg: dict = None, gravity=(0, 0, 9.81)) -> Factor:
    """Build from preintegrated measurements: ``pioc`` holds rRp (3x3),
    rPosp, rVelp, pBw, pBa, and the interval seconds ``dt`` (rnTime*1e-9 in
    the reference); ``picg`` holds the five compensation-gradient 3x3 blocks
    (zeros if omitted)."""
    picg = picg or {}
    grads = {
        k: np.asarray(picg.get(k, np.zeros((3, 3))), dtype=np.float64)
        for k in ("dRdDw", "dVdDw", "dPdDw", "dVdDa", "dPdDa")
    }
    rRp = np.asarray(pioc.get("rRp", np.eye(3)), dtype=np.float64)
    from rome_tpu.utils.host import host_default_device

    with host_default_device():
        dlog = np.asarray(_so3_log(jnp.asarray(rRp, dtype=jnp.float32)))
    pi_meas = np.concatenate(
        [
            dlog,
            np.asarray(pioc.get("pBw", np.zeros(3)), np.float64),
            np.asarray(pioc.get("rVelp", np.zeros(3)), np.float64),
            np.asarray(pioc.get("rPosp", np.zeros(3)), np.float64),
            np.asarray(pioc.get("pBa", np.zeros(3)), np.float64),
        ]
    )
    params = gaussian_params(Zij.mean(), Zij.cov())
    params.update(
        pi_meas=pi_meas,
        dt=np.float64(pioc.get("dt", 0.0)),
        gravity=np.asarray(gravity, np.float64),
        **grads,
    )
    return Factor(ftype=INERTIAL_POSE3, variables=(), params=params, dists=(Zij,))


# --- PriorInertialPose3 (InertialPose3.jl:291-313) --------------------------

def _prior_ip3_res(params, x):
    M = InertialPose3V.manifold
    return M.local(x, M.exp(params["z"]))


PRIOR_INERTIAL_POSE3 = register_factor_type(
    FactorType(
        name="PriorInertialPose3",
        variable_types=(InertialPose3V,),
        zdim=15,
        residual=_prior_ip3_res,
        initializers={0: lambda params, pts: params["z"]},
        coord_types=("e",) * 3 + ("c",) * 3 + ("e",) * 9,
        doc="Prior on the legacy 15-dof inertial state "
        "(InertialPose3.jl:291-313).",
    )
)


def PriorInertialPose3(Zi: Distribution = None) -> Factor:
    Zi = Zi or MvNormal(np.zeros(15), np.eye(15) * 0.1)
    params = gaussian_params(Zi.mean(), Zi.cov())
    return Factor(ftype=PRIOR_INERTIAL_POSE3, variables=(), params=params, dists=(Zi,))
