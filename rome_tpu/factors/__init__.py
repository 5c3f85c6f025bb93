"""Factor library — importing this package registers every factor type.

Catalog mirrors SURVEY.md §2.2 (reference /root/reference/src/factors/).
"""

from rome_tpu.factors.base import (
    Factor,
    FactorType,
    gaussian_params,
    get_factor_type,
    list_factor_types,
    make_gaussian_factor,
    register_factor_type,
)
from rome_tpu.factors.point2 import (
    Point2Point2,
    Point2Point2Range,
    PriorPoint2,
)
from rome_tpu.factors.pose2 import (
    MutablePose2Pose2Gaussian,
    PartialPriorYawPose2,
    Pose2Point2,
    Pose2Pose2,
    PriorPose2,
    update_mutable_odo,
)
from rome_tpu.factors.bearing_range import (
    Pose2Point2Bearing,
    Pose2Point2BearingRange,
    Pose2Point2Range,
)
from rome_tpu.factors.point3 import Point3Point3, PriorPoint3
from rome_tpu.factors.pose3 import (
    Pose3Pose3,
    Pose3Pose3RotOffset,
    Pose3Pose3Rotation,
    Pose3Pose3Transform,
    Pose3Pose3UnitTrans,
    Pose3Pose3XYYaw,
    PriorPose3,
    PriorPose3ZRP,
    PriorRotation3,
)
from rome_tpu.factors.polar import PolarPolar, PriorPolar
from rome_tpu.factors.dyn2d import (
    DynPoint2DynPoint2,
    DynPoint2VelocityPrior,
    DynPose2DynPose2,
    DynPose2Pose2,
    DynPose2VelocityPrior,
    Point2Point2Velocity,
    VelPoint2VelPoint2,
    VelPose2VelPose2,
)
from rome_tpu.factors.ode import InertialDynamic, imu_kinematic
from rome_tpu.factors.fluxmix import (
    FluxModelsPose2Pose2,
    MixtureFluxPose2Pose2,
    NNOdoPredictor,
    build_pose2_odo_nn_01,
    build_pose2_odo_nn_01_from_weights,
    calc_velocity_inter_pose2,
    pose2_odo_nn_forward,
)
from rome_tpu.factors.legacy_inertial import (
    InertialPose3,
    InertialPose3V,
    PriorInertialPose3,
)
from rome_tpu.factors.sensors import (
    LinearRangeBearingElevation,
    MultipleFeatures2D,
    RangeAzimuthElevation,
    range_azimuth_elevation,
)
from rome_tpu.factors.inertial import (
    IMUDeltaFactor,
    PriorIMUBias,
    PriorRotVelPos,
    PriorVelPos3,
    VelAlign,
    VelPosRotVelPos,
    preintegrate_imu,
)

__all__ = [
    "Factor",
    "FactorType",
    "gaussian_params",
    "get_factor_type",
    "list_factor_types",
    "make_gaussian_factor",
    "register_factor_type",
    "PriorPoint2",
    "Point2Point2",
    "Point2Point2Range",
    "PriorPose2",
    "Pose2Pose2",
    "PartialPriorYawPose2",
    "MutablePose2Pose2Gaussian",
    "update_mutable_odo",
    "Pose2Point2",
    "Pose2Point2Bearing",
    "Pose2Point2Range",
    "Pose2Point2BearingRange",
    "PriorPoint3",
    "Point3Point3",
    "PriorPose3",
    "Pose3Pose3",
    "Pose3Pose3RotOffset",
    "Pose3Pose3Transform",
    "Pose3Pose3UnitTrans",
    "PriorPose3ZRP",
    "Pose3Pose3XYYaw",
    "Pose3Pose3Rotation",
    "PriorRotation3",
    "PriorPolar",
    "PolarPolar",
    "LinearRangeBearingElevation",
    "MultipleFeatures2D",
    "RangeAzimuthElevation",
    "range_azimuth_elevation",
    "DynPoint2VelocityPrior",
    "DynPoint2DynPoint2",
    "Point2Point2Velocity",
    "VelPoint2VelPoint2",
    "DynPose2VelocityPrior",
    "DynPose2Pose2",
    "DynPose2DynPose2",
    "VelPose2VelPose2",
    "IMUDeltaFactor",
    "preintegrate_imu",
    "InertialDynamic",
    "imu_kinematic",
    "MixtureFluxPose2Pose2",
    "FluxModelsPose2Pose2",
    "NNOdoPredictor",
    "build_pose2_odo_nn_01",
    "build_pose2_odo_nn_01_from_weights",
    "calc_velocity_inter_pose2",
    "pose2_odo_nn_forward",
    "InertialPose3",
    "InertialPose3V",
    "PriorInertialPose3",
    "PriorRotVelPos",
    "PriorVelPos3",
    "PriorIMUBias",
    "VelPosRotVelPos",
    "VelAlign",
]
