#!/bin/bash
# RL launch helper (parity with /root/reference/scripts/run_rl.sh):
# nohup-launch a MatInvent run with log capture.
#   ./scripts/run_rl.sh <expname> [extra overrides...]
set -euo pipefail

EXPNAME=${1:-test}
shift || true

mkdir -p logs
nohup python main.py \
    expname="${EXPNAME}" \
    pipeline=mat_invent \
    model=mattergen \
    reward=hhi \
    logger=csv \
    "$@" \
    > "logs/${EXPNAME}.log" 2>&1 &
echo "launched ${EXPNAME} (pid $!) -> logs/${EXPNAME}.log"
