#!/bin/bash
# Round-4 VERDICT #5: train step at the SHIPPED config (R=512, bs=4,
# configs/config_train_sfd2.json) + teacher precompute throughput.
# Run under timeout; results append to BENCH_ATTEMPTS.jsonl-adjacent logs.
set -x
cd /root/repo
timeout 2400 env BT_R=512 BT_BS=4 python scripts/bench_train.py 2>train512.stderr | tee train512.json
timeout 1800 python scripts/bench_teacher.py 2>teacher.stderr | tee teacher.json
