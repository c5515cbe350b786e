#!/bin/bash
# RobotCar-Seasons benchmark (parity: reference test_robotcar knobs).
set -e
DATASET=${DATASET:-/data/robotcar}
OUT=${OUT:-outputs/robotcar}
FEATS=$OUT/feats-sfd2-n4096-r1600.h5
python -m sfd2_tpu.cli.localizer --dataset robotcar \
  --reference_sfm "$OUT/sfm_sfd2" \
  --queries "$DATASET/queries_with_intrinsics_rear.txt" \
  --retrieval "$DATASET/pairs-query-netvlad20.txt" \
  --features "$FEATS" --results "$OUT/poses.txt" \
  --init_type sng --ransac_thresh 12 --opt_thresh 12 \
  --covisibility_frame 20 --opt_type clurefpos --inlier_thresh 100 \
  --iters 5 --radius 20 --obs_thresh 3
