from sfd2_tpu.ops.nms import simple_nms
from sfd2_tpu.ops.resize import resize_bilinear
from sfd2_tpu.ops.grid_sample import grid_sample_bilinear, sample_at_points
from sfd2_tpu.ops.extract import extract_keypoints
from sfd2_tpu.ops.matching import (
    mutual_nn_match,
    mutual_nn_ratio_match,
    one_way_match,
    similarity_topk,
)
from sfd2_tpu.ops.matching import batch_matcher, mutual_nn_match_with_labels
from sfd2_tpu.ops.pallas_match import (
    mutual_nn_match_pallas,
    mutual_nn_ratio_match_pallas,
    nn_argmax_pallas,
    nn_top2_pallas,
)
