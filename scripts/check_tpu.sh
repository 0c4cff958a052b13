#!/bin/bash
# Sanity-check the TPU environment on every worker of a TPU VM (pod slice).
# Counterpart of the reference's scripts/check_gpu.sh (SLURM + CUDA probe).
#
# Usage:
#   ./scripts/check_tpu.sh <tpu-name> [zone] [project]
# or run the python block directly on a worker:
#   python - <<'EOF' ... (see below)
set -euo pipefail

TPU_NAME="${1:?usage: check_tpu.sh <tpu-name> [zone] [project]}"
ZONE="${2:-us-central2-b}"
PROJECT="${3:-$(gcloud config get-value project)}"

gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone "$ZONE" --project "$PROJECT" --worker=all \
  --command 'python3 - <<EOF
import jax, sys
print("python:", sys.version.split()[0], "jax:", jax.__version__)
print("process", jax.process_index(), "/", jax.process_count())
print("local devices:", jax.local_devices())
print("global device count:", jax.device_count())
import jax.numpy as jnp
x = jnp.ones((8, 128, 128), jnp.bfloat16)
print("matmul ok:", (x @ x).block_until_ready().shape)
EOF'
