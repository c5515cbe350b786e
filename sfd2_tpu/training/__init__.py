from sfd2_tpu.training.ap_loss import ap_loss
from sfd2_tpu.training.sampler import NghSampler2DS
from sfd2_tpu.training.losses import SegLossConfig, seg_loss, reliability_loss
