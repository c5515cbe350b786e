#!/bin/bash
# Extended CMU-Seasons per-slice benchmark (parity: reference test_ecmu).
set -e
DATASET=${DATASET:-/data/ecmu}
OUT=${OUT:-outputs/ecmu}
SLICE=${SLICE:-18}
FEATS=$OUT/slice$SLICE/feats-sfd2-n4096-r1024.h5
python -m sfd2_tpu.cli.localizer --dataset ecmu \
  --reference_sfm "$OUT/slice$SLICE/sfm_sfd2" \
  --queries "$DATASET/slice$SLICE/test-images-slice$SLICE.txt" \
  --retrieval "$DATASET/slice$SLICE/pairs-query-netvlad10.txt" \
  --features "$FEATS" --results "$OUT/slice$SLICE/poses.txt" \
  --init_type sng --ransac_thresh 12 --opt_thresh 12 \
  --covisibility_frame 10 --opt_type clurefobs --inlier_thresh 20 \
  --iters 5 --radius 20 --obs_thresh 3 \
  --query_prefix query/ --db_prefix database/
