from sfd2_tpu.models.sfd2 import ResSegNet, ResSegNetV2, DetectionOutput
from sfd2_tpu.models.superpoint import SuperPoint
