#!/bin/bash
# Launch diffgfdn_tpu training on a Cloud TPU VM / pod slice.
# Counterpart of the reference's scripts/run_training_gpu.sh (SLURM+CUDA);
# TPU fleets are driven through gcloud + multi-worker SPMD instead of SLURM.
#
#   ./scripts/run_training_tpu.sh <tpu-name> [config] [zone] [project]
#
# * single host (v5e-1..8): one process sees all local chips; the band x
#   batch mesh (diffgfdn_tpu.parallel.mesh.make_mesh) spans them via GSPMD.
# * pod slice (v5e-16+): the same command runs on EVERY worker
#   (--worker=all); jax.distributed.initialize() is called by the CLI when
#   it detects a multi-process TPU environment, and the mesh spans the
#   whole slice (collectives ride ICI).
#
# Queued-resource (preemptible-friendly) creation, if the slice does not
# exist yet:
#   gcloud compute tpus queued-resources create "$TPU_NAME-qr" \
#     --node-id "$TPU_NAME" --zone "$ZONE" --project "$PROJECT" \
#     --accelerator-type v5litepod-8 --runtime-version v2-alpha-tpuv5-lite
set -euo pipefail

TPU_NAME="${1:?usage: run_training_tpu.sh <tpu-name> [config] [zone] [project]}"
CONFIG="${2:-configs/three_room_example.yml}"
ZONE="${3:-us-central2-b}"
PROJECT="${4:-$(gcloud config get-value project)}"
REPO_DIR="${REPO_DIR:-\$HOME/diffgfdn_tpu}"

gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone "$ZONE" --project "$PROJECT" --worker=all \
  --command "cd $REPO_DIR && \
    python3 -m diffgfdn_tpu.cli.run_model -c $CONFIG --wipe-train-dir"

echo "training launched on $TPU_NAME ($ZONE); checkpoints land in the"
echo "train_dir from $CONFIG (use a shared GCS fuse mount on pod slices)"
