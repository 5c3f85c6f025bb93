"""Variable types — the SLAM state manifolds (SURVEY.md §2.1).

Mirrors the reference's ``@defVariable`` table
(/root/reference/src/variables/VariableTypes.jl:13-134) but stores every
variable type as a named manifold with flat-vector points so that all
variables of one type live in a single dense ``(n, point_dim)`` device array.
"""

from __future__ import annotations

from dataclasses import dataclass

from rome_tpu.manifolds.base import (
    Manifold,
    ProductGroup,
    SE2_,
    SE3_,
    SO2_,
    SO3_,
    T1,
    T2,
    T3,
    T4,
)


@dataclass(frozen=True)
class VariableType:
    """A named variable type bound to a manifold (cf. DFG ``@defVariable``)."""

    name: str
    manifold: Manifold

    @property
    def point_dim(self) -> int:
        return self.manifold.point_dim

    @property
    def dof(self) -> int:
        return self.manifold.dof

    def __repr__(self):
        return self.name


# VariableTypes.jl:13 — XY Euclidean point
Point2 = VariableType("Point2", T2)
# VariableTypes.jl:27 — XYZ Euclidean point
Point3 = VariableType("Point3", T3)
# VariableTypes.jl:35 — SE(2) pose (hybrid tangent representation)
Pose2 = VariableType("Pose2", SE2_)
# VariableTypes.jl:47 — SE(3) pose
Pose3 = VariableType("Pose3", SE3_)
# VariableTypes.jl:50 — SO(3) rotation
Rotation3 = VariableType("Rotation3", SO3_)
# VariableTypes.jl:53-68 — SO(3) x T(3) x T(3): rotation, velocity, position
RotVelPos = VariableType("RotVelPos", ProductGroup([SO3_, T3, T3], name="RotVelPos_M"))
# VariableTypes.jl:72-85 — T(3) x T(3): velocity, position
VelPos3 = VariableType("VelPos3", ProductGroup([T3, T3], name="VelPos3_M"))
# VariableTypes.jl:98 — (x, y, dx/dt, dy/dt)
DynPoint2 = VariableType("DynPoint2", T4)
# VariableTypes.jl:109-116 — SE(2) x T(2): (x, y, theta, dx/dt, dy/dt)
DynPose2 = VariableType("DynPose2", ProductGroup([SE2_, T2], name="DynPose2_M"))
# VariableTypes.jl:134 — experimental Circle x R (FixmeManifolds.jl:52-77)
BearingRange2 = VariableType("BearingRange2", ProductGroup([SO2_, T1], name="BearingRange_M"))
# Polar coordinate variable (factors/Polar.jl) — coords (range, angle),
# matching the reference getSample stacking order (Polar.jl:20-27)
Polar = VariableType("Polar", ProductGroup([T1, SO2_], name="Polar_M"))
# IMU bias state (accelerometer bias [3], gyroscope bias [3]);
# reference keeps these on T(3)xT(3) inside PriorIMUBias (Inertial/PriorIMUBias.jl:13-37)
IMUBias = VariableType("IMUBias", ProductGroup([T3, T3], name="IMUBias_M"))

_REGISTRY = {
    v.name: v
    for v in [
        Point2,
        Point3,
        Pose2,
        Pose3,
        Rotation3,
        RotVelPos,
        VelPos3,
        DynPoint2,
        DynPose2,
        BearingRange2,
        Polar,
        IMUBias,
    ]
}


def get_variable_type(name_or_type) -> VariableType:
    if isinstance(name_or_type, VariableType):
        return name_or_type
    return _REGISTRY[str(name_or_type)]


def register_variable_type(vt: VariableType):
    """Out-of-library variable extension hook (cf. ``@defVariable`` in tests)."""
    _REGISTRY[vt.name] = vt
    return vt


def list_variable_types():
    return sorted(_REGISTRY)
