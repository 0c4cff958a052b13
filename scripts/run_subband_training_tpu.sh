#!/bin/bash
# Launch band-parallel subband training on a Cloud TPU VM / pod slice:
# all 8 octave-band GFDNs train in ONE sharded program, one band per chip
# on an 8-chip slice (the reference runs 8 sequential python jobs,
# run_subband_training_treble.py:175-204).
#
#   ./scripts/run_subband_training_tpu.sh <tpu-name> <dataset.pkl> [zone] [project]
set -euo pipefail

TPU_NAME="${1:?usage: run_subband_training_tpu.sh <tpu-name> <dataset> [zone] [project]}"
DATASET="${2:?dataset pickle path (on the TPU VM / GCS fuse mount)}"
ZONE="${3:-us-central2-b}"
PROJECT="${4:-$(gcloud config get-value project)}"
REPO_DIR="${REPO_DIR:-\$HOME/diffgfdn_tpu}"

gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone "$ZONE" --project "$PROJECT" --worker=all \
  --command "cd $REPO_DIR && \
    python3 -m diffgfdn_tpu.cli.run_subband_training \
      --dataset $DATASET --band-parallel \
      --train-dir output/subband"
