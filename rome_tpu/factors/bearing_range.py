"""Bearing / range factors from Pose2 to Point2 (reference:
/root/reference/src/factors/Bearing2D.jl, Range2D.jl, BearingRange2D.jl).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rome_tpu.distributions import Distribution, Normal
from rome_tpu.factors.base import (
    Factor,
    FactorType,
    register_factor_type,
)
from rome_tpu.utils.math import rot2, sym_rem, safe_norm
from rome_tpu.variables import Point2, Pose2


def _body_frame_point(p, l):
    """pl = R(theta)^T (l - t): landmark expressed in the pose body frame."""
    return jnp.squeeze(rot2(-p[2]) @ (l[:2] - p[:2])[:, None], -1)


# --- Pose2Point2Bearing (Bearing2D.jl:23-32) -------------------------------

def _bearing_res(params, p, l):
    pl = _body_frame_point(p, l)
    return sym_rem(params["z"] - jnp.arctan2(pl[1], pl[0]))


POSE2POINT2BEARING = register_factor_type(
    FactorType(
        name="Pose2Point2Bearing",
        variable_types=(Pose2, Point2),
        zdim=1,
        residual=_bearing_res,
        coord_types=("c",),
        doc="Bearing-only sighting, 1-dof on SO(2) (Bearing2D.jl:23-32).",
    )
)


def Pose2Point2Bearing(Z: Distribution):
    from rome_tpu.factors.base import make_gaussian_factor

    return make_gaussian_factor(POSE2POINT2BEARING, (), Z)


# --- Pose2Point2Range (Range2D.jl:42-54) -----------------------------------

def _pose_range_res(params, p, l):
    return params["z"] - safe_norm(l[:2] - p[:2])


POSE2POINT2RANGE = register_factor_type(
    FactorType(
        name="Pose2Point2Range",
        variable_types=(Pose2, Point2),
        zdim=1,
        residual=_pose_range_res,
        coord_types=("e",),
        partial=(0, 1),
        doc="Range-only sighting from Pose2 to Point2 (Range2D.jl:42-54).",
    )
)


def Pose2Point2Range(Z: Distribution):
    from rome_tpu.factors.base import make_gaussian_factor

    return make_gaussian_factor(POSE2POINT2RANGE, (), Z)


# --- Pose2Point2BearingRange (BearingRange2D.jl:48-64) ---------------------
# residual = [sym_rem(z_theta - atan2(pl)), z_r - ||pl||], bearing FIRST.

def _bearing_range_res(params, p, l):
    pl = _body_frame_point(p, l)
    dth = sym_rem(params["z"][0] - jnp.arctan2(pl[1], pl[0]))
    dr = params["z"][1] - safe_norm(pl)
    return jnp.stack([dth, dr])


def _bearing_range_init_landmark(params, pts):
    p = pts[0]
    th = p[2] + params["z"][0]
    r = params["z"][1]
    return p[:2] + r * jnp.stack([jnp.cos(th), jnp.sin(th)])


POSE2POINT2BEARINGRANGE = register_factor_type(
    FactorType(
        name="Pose2Point2BearingRange",
        variable_types=(Pose2, Point2),
        zdim=2,
        residual=_bearing_range_res,
        initializers={1: _bearing_range_init_landmark},
        coord_types=("c", "e"),
        doc="Polar body-frame sighting, coords (bearing, range) "
        "(BearingRange2D.jl:10-64).",
    )
)


def Pose2Point2BearingRange(
    bearing: Distribution, range_: Distribution = None, cov=None, **kw
):
    """Two independent scalar beliefs, bearing first — matches the reference
    constructor ``Pose2Point2BearingRange(Normal(th, s), Normal(r, s))`` and
    its parametric (mean, diag inv-var) lowering (BearingRange2D.jl:30-37).

    ``cov``: optional full 2x2 (bearing, range) covariance carrying the
    bearing-range CROSS term — the g2o ``LANDMARK`` command's (ib, ibr, ir)
    information triple (g2oParser.jl:123-133). When given, the measurement
    becomes one joint MvNormal.
    """
    from rome_tpu.distributions import MvNormal
    from rome_tpu.factors.base import gaussian_params

    if range_ is None:
        range_ = Normal(1.0, 1.0)
    mean = np.array([bearing.mean()[0], range_.mean()[0]])
    if cov is None:
        cov = np.diag([bearing.cov()[0, 0], range_.cov()[0, 0]])
        dists = (bearing, range_)
    else:
        cov = np.asarray(cov, dtype=np.float64)
        dists = (MvNormal(mean, cov),)

    return Factor(
        ftype=POSE2POINT2BEARINGRANGE,
        variables=(),
        params=gaussian_params(mean, cov),
        dists=dists,
        **kw,
    )
