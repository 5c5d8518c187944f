from .se3 import (
    hat,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_compose,
    se3_inverse,
    se3_apply,
    se3_retract,
    quat_from_rotmat,
    rotmat_from_quat,
)
from .sim3 import (
    sim3_identity,
    sim3_apply,
    sim3_compose,
    sim3_inverse,
    sim3_exp,
    sim3_log,
    sim3_retract,
)
from .camera import (
    CameraIntrinsics,
    project,
    project_stereo,
    backproject,
    distort,
    undistort_points,
    in_image,
)
