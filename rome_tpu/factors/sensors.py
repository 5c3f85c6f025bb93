"""Sensor-model factors: DIDSON sonar range/bearing/elevation, multi-feature
angle constraints, and range/azimuth/elevation conversion helpers.

Reference: /root/reference/src/factors/SensorModels.jl (LinearRangeBearing
Elevation with thread-local reuse buffers — the functional JAX design simply
has none), MultipleFeaturesConstraint.jl:35-136, RangeAzimuthElevation.jl:4-29.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rome_tpu.distributions import Distribution, MvNormal, Normal, Uniform
from rome_tpu.factors.base import (
    Factor,
    FactorType,
    gaussian_params,
    register_factor_type,
)
from rome_tpu.manifolds import quat as Q
from rome_tpu.manifolds.base import SE2_
from rome_tpu.variables import Point2, Point3, Pose2, Pose3


# --- LinearRangeBearingElevation (SensorModels.jl:22-95) -------------------

def _lrbe_res(params, pose, landm):
    # body-frame landmark: bTl = R(q)^T (L - t)  (SensorModels.jl:57-64)
    t, q = pose[..., :3], pose[..., 3:7]
    b = Q.qrotate(Q.qconj(q), landm - t)
    rng = jnp.linalg.norm(b, axis=-1)
    bearing = jnp.arctan2(b[..., 1], b[..., 0])
    elev = -jnp.arctan2(b[..., 2], b[..., 0])
    return params["z"] - jnp.stack([rng, bearing, elev], axis=-1)


LINEAR_RANGE_BEARING_ELEVATION = register_factor_type(
    FactorType(
        name="LinearRangeBearingElevation",
        variable_types=(Pose3, Point3),
        zdim=3,
        residual=_lrbe_res,
        coord_types=("e", "c", "c"),
        doc="DIDSON sonar range/bearing/elevation factor "
        "(SensorModels.jl:22-95: residualLRBE!).",
    )
)


def LinearRangeBearingElevation(range_, bearing, elev=None) -> Factor:
    """Ctor mirroring the reference: range/bearing as (mu, sigma) tuples or
    Normal beliefs; elevation defaults to Uniform(-0.25133, 0.25133)
    (SensorModels.jl:28)."""
    rng = Normal(*range_) if isinstance(range_, tuple) else range_
    brg = Normal(*bearing) if isinstance(bearing, tuple) else bearing
    elev = elev or Uniform(-0.25133, 0.25133)
    mean = np.array(
        [
            float(np.asarray(rng.mean()).reshape(())),
            float(np.asarray(brg.mean()).reshape(())),
            float(np.asarray(elev.mean()).reshape(())),
        ]
    )
    cov = np.diag(
        [
            float(np.asarray(rng.cov()).reshape(())),
            float(np.asarray(brg.cov()).reshape(())),
            float(np.asarray(elev.cov()).reshape(())),
        ]
    )
    params = gaussian_params(mean, cov)
    return Factor(
        ftype=LINEAR_RANGE_BEARING_ELEVATION,
        variables=(),
        params=params,
        dists=(rng, brg, elev),
    )


# --- MultipleFeatures2D (MultipleFeaturesConstraint.jl:35-136) -------------

def _cam_angle(pose2, bTc, lm):
    """Bearing angle of landmark lm from the camera frame wTb * bTc."""
    cam = SE2_.compose(pose2, bTc)
    rel = SE2_.compose(
        SE2_.inverse(cam),
        jnp.concatenate([lm, jnp.zeros_like(lm[..., :1])], axis=-1),
    )
    return jnp.arctan2(rel[..., 1], rel[..., 0])


def _mf2d_res(params, pi, pj, l1, l2, l3):
    bTc = params["bTc"]
    z = params["z"]  # 6 angles: (xi->l1,l2,l3, xj->l1,l2,l3)
    ais = jnp.stack(
        [_cam_angle(pi, bTc, l) for l in (l1, l2, l3)]
        + [_cam_angle(pj, bTc, l) for l in (l1, l2, l3)],
        axis=-1,
    )
    from rome_tpu.utils.math import sym_rem

    return sym_rem(z - ais)


MULTIPLE_FEATURES_2D = register_factor_type(
    FactorType(
        name="MultipleFeatures2D",
        variable_types=(Pose2, Pose2, Point2, Point2, Point2),
        zdim=6,
        residual=_mf2d_res,
        coord_types=("c",) * 6,
        doc="Two poses sight three landmarks through a body-to-camera lever "
        "arm; residual = six bearing-angle errors "
        "(MultipleFeaturesConstraint.jl:35-136; the reference's built-in "
        "Categorical bimodality is superseded by addFactor! multihypo=, as "
        "its own comment notes).",
    )
)


def MultipleFeatures2D(
    xir1, xir2, xir3, xjr1, xjr2, xjr3, bTc=None
) -> Factor:
    """Angles as Normal beliefs or (mu, sigma) tuples; bTc is the SE(2)
    body-to-camera transform coords (default identity)."""

    def _n(x):
        return Normal(*x) if isinstance(x, tuple) else x

    beliefs = [_n(x) for x in (xir1, xir2, xir3, xjr1, xjr2, xjr3)]
    mean = np.array([float(np.asarray(b.mean()).reshape(())) for b in beliefs])
    cov = np.diag([float(np.asarray(b.cov()).reshape(())) for b in beliefs])
    params = gaussian_params(mean, cov)
    params["bTc"] = np.zeros(3) if bTc is None else np.asarray(bTc, np.float64)
    return Factor(
        ftype=MULTIPLE_FEATURES_2D,
        variables=(),
        params=params,
        dists=tuple(beliefs),
    )


# --- RangeAzimuthElevation (RangeAzimuthElevation.jl:4-29) -----------------

class RangeAzimuthElevation:
    """Conversion record; elevation may be None for 2-dof sightings."""

    def __init__(self, range_, azimuth, elevation=None):
        self.range = float(range_)
        self.azimuth = float(azimuth)
        self.elevation = None if elevation is None else float(elevation)

    def __repr__(self):
        return (
            f"RangeAzimuthElevation({self.range}, {self.azimuth}, "
            f"{self.elevation})"
        )

    @classmethod
    def from_tuple(cls, val):
        """convert((:rangeazimuth|:rangeazimuthelevation, values))
        (RangeAzimuthElevation.jl:10-18)."""
        kind, vals = val
        kind = str(kind).lstrip(":")
        if kind == "rangeazimuth":
            return cls(vals[0], vals[1])
        if kind == "rangeazimuthelevation":
            return cls(vals[0], vals[1], vals[2])
        raise ValueError(f"Unknown conversion from {kind} to RangeAzimuthElevation")


def range_azimuth_elevation(pose3_point, translation) -> RangeAzimuthElevation:
    """``\\(s::SE3, wTr::Translation)`` analogue (RangeAzimuthElevation.jl:22-29):
    body-frame range/azimuth/elevation of a world point seen from a Pose3."""
    p = np.asarray(pose3_point, dtype=np.float64)
    w = np.asarray(translation, dtype=np.float64)
    from rome_tpu.utils.host import host_default_device

    with host_default_device():
        b = np.asarray(
            Q.qrotate(Q.qconj(jnp.asarray(p[3:7])), jnp.asarray(w - p[:3]))
        )
    rng = float(np.linalg.norm(b))
    azi = float(np.arctan2(b[1], b[0]))
    elev = float(np.arctan2(b[2], b[0]))
    return RangeAzimuthElevation(rng, azi, elev)
