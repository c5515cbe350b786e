from sfd2_tpu.localization.pnp import (
    pnp_dlt,
    refine_pose_lm,
)
from sfd2_tpu.localization.ransac import pnp_ransac, PnPResult
