from mcslam_tpu.geometry import lie
from mcslam_tpu.geometry.lie import (
    so3_hat,
    so3_vee,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inverse,
    se3_matrix,
    se3_apply,
    se3_retract,
    quat_from_rot,
    rot_from_quat,
)
