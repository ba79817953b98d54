#!/usr/bin/env bash
# SLURM submission for multi-host TPU-pod training (reference parity:
# docker/cluster/submit_job_slurm.sh, docs multi_gpu.rst multi-node).
#
# One task per TPU host; jax.distributed coordinates over the coordinator
# address (app_launcher --distributed wires jax.distributed.initialize from
# these env vars — parallel/mesh.py).
#
# Usage: sbatch docker/cluster/submit_job_slurm.sh <task-id> [extra args...]
#SBATCH --job-name=isaaclab-tpu
#SBATCH --nodes=4
#SBATCH --ntasks-per-node=1
#SBATCH --time=24:00:00
#SBATCH --output=logs/slurm/%j.out

set -euo pipefail
source "$(dirname "$0")/.env.cluster"

TASK_ID="${1:?usage: submit_job_slurm.sh <task-id> [args...]}"
shift || true

COORD_HOST=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export JAX_COORDINATOR_ADDRESS="${COORD_HOST}:${COORDINATOR_PORT:-8476}"
export JAX_NUM_PROCESSES="$SLURM_NNODES"

srun --export=ALL bash -c '
  export JAX_PROCESS_ID=$SLURM_PROCID
  '"${CONTAINER_RUNTIME:-singularity}"' exec --nv '"$CONTAINER_IMAGE"' \
    python scripts/reinforcement_learning/rsl_rl/train.py \
      --task '"$TASK_ID"' --headless --distributed '"$*"'
'
