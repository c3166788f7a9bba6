#!/usr/bin/env bash
# Stage 3 — LoRA fine-tune. Equivalent of train_run_lora.sh.
set -euo pipefail
SUBJECT=${1:?usage: train_lora.sh <sub-XX> [extra overrides...]}
shift || true
export SCRATCH_PATH=${SCRATCH_PATH:-/data/lazyload}
export TRANSFORMERS_OFFLINE=1

python -m phantom_vlb_tpu.cli.train \
  experiment=vlb_friends_lora "subject=$SUBJECT" \
  "model.checkpoint_path=${CKPT:-/data/models/VideoLLaMA2-7B}" "$@"
