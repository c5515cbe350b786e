from sfd2_tpu.geometry.rotations import (
    qvec_to_rotmat,
    rotmat_to_qvec,
    quat_multiply,
    quat_conjugate,
    quat_angular_error_deg,
)
from sfd2_tpu.geometry.cameras import (
    CAMERA_MODEL_IDS,
    CAMERA_MODEL_NAMES,
    Camera,
    project_points,
    world_to_camera,
    camera_depths,
)
from sfd2_tpu.geometry.pose import (
    pose_error,
    invert_pose,
)
