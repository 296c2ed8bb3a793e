#!/bin/bash
# Offline generation + SUN evaluation (parity with the reference's
# scripts/gen_eval.sh): 32 batches x 32 = 1024 structures from a finetuned
# checkpoint, then metrics.json with validity/unique/novel/stable fractions.
#   ./scripts/gen_eval.sh <model_ckpt_dir> <output_dir> \
#       [reference.extxyz] [reference_energies.json]
# With reference_energies the evaluation also reports frac_stable/frac_sun
# (relax + hull scoring, the reference's mattergen-evaluate --relax mode).
set -euo pipefail

MODEL_PATH=${1:?usage: gen_eval.sh <model_ckpt_dir> <output_dir> [reference.extxyz] [reference_energies.json]}
OUTPUT=${2:?}
REFERENCE=${3:-}
ENERGIES=${4:-}

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
if [[ -n "${ENERGIES}" ]]; then
  ARGS+=("reference_energies=${ENERGIES}" "relax=true")
fi

python gen_eval.py "${ARGS[@]}"
