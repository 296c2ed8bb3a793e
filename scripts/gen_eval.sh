#!/bin/bash
# Offline generation + SUN evaluation (parity with the reference's
# scripts/gen_eval.sh): 32 batches x 32 = 1024 structures from a finetuned
# checkpoint, then metrics.json with validity/unique/novel/stable fractions.
#   ./scripts/gen_eval.sh <model_ckpt_dir> <output_dir> [reference.extxyz]
set -euo pipefail

MODEL_PATH=${1:?usage: gen_eval.sh <model_ckpt_dir> <output_dir> [reference.extxyz]}
OUTPUT=${2:?}
REFERENCE=${3:-}

ARGS=(
  "model=mattergen"
  "model.model_path=${MODEL_PATH}"
  "output_dir=${OUTPUT}"
  "batch_size=32"
  "num_batches=32"
)
if [[ -n "${REFERENCE}" ]]; then
  ARGS+=("reference_path=${REFERENCE}")
fi

python gen_eval.py "${ARGS[@]}"
