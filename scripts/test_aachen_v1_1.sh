#!/bin/bash
# Aachen v1.1 benchmark pipeline (parity: reference test_aachenv_1_1).
# Stages toggled by args: extract_feat_db match_db triangulation localize
set -e
DATASET=${DATASET:-/data/aachen_v1.1}
OUT=${OUT:-outputs/aachen_v1.1}
WEIGHTS=${WEIGHTS:-weights/sfd2.pth}
FEATS=$OUT/feats-sfd2-n4096-r1600.h5
MATCHES=$OUT/matches-NNM.h5
mkdir -p "$OUT"

for stage in "$@"; do case $stage in
extract_feat_db)
  python -m sfd2_tpu.cli.extract_features --image_dir "$DATASET/images/images_upright" \
    --export_fn "$FEATS" --conf sfd2-n4096-r1600 --weights "$WEIGHTS" ;;
match_db)
  python -m sfd2_tpu.cli.match_features --features "$FEATS" \
    --pairs "$DATASET/pairs-db-covis20.txt" --export_fn "$MATCHES" --conf NNM ;;
triangulation)
  python -m sfd2_tpu.cli.triangulation --sfm_dir "$OUT/sfm_sfd2" \
    --reference_sfm_model "$DATASET/3D-models/aachen_v_1_1" \
    --pairs "$DATASET/pairs-db-covis20.txt" \
    --features "$FEATS" --matches "$MATCHES" ;;
localize)
  python -m sfd2_tpu.cli.localizer --dataset aachen_v1.1 \
    --reference_sfm "$OUT/sfm_sfd2" \
    --queries "$DATASET/queries/*_time_queries_with_intrinsics.txt" \
    --retrieval "$DATASET/pairs-query-netvlad50.txt" \
    --features "$FEATS" --results "$OUT/poses.txt" \
    --init_type sng --ransac_thresh 15 --opt_thresh 15 \
    --covisibility_frame 50 --opt_type clurefobs --inlier_thresh 10 \
    --iters 5 --radius 30 --obs_thresh 3 \
    --gt_pose_fn "$DATASET/gt_poses.txt" ;;
esac; done
