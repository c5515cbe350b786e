from sfd2_tpu.io.colmap_model import (
    Image,
    Point3D,
    read_model,
    write_model,
)
from sfd2_tpu.geometry.cameras import Camera
