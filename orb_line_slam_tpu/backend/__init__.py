from .pose_opt import PoseOptResult, pose_optimize
from .residuals import (
    inv_level_sigma2,
    line_obs_coeffs,
    make_line_residual_fn,
    make_point_residual_fn,
    pose_jacobian,
)
from .robust import CHI2_MONO, CHI2_STEREO, huber_weight
