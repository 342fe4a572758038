#!/usr/bin/env bash
# Multi-host TPU-pod training launch (the reference's train_slurm.sh analog).
# Run the SAME command on every host of the slice, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="..."
# jax.distributed.initialize() picks up the TPU pod metadata automatically;
# per-host input sharding comes from jax.process_index() in the DataLoader.
set -euo pipefail
CFG=$1; DATA=$2; OUT=$3; VOCAB=$4; shift 4
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
# JAX_MULTIHOST=1 makes main.py call jax.distributed.initialize() in ITS
# OWN process (auto-detecting pod metadata) before first device use.
JAX_MULTIHOST=1 python main.py -c "$CFG" --datasets "$DATA" \
  --output_dir "$OUT" --vocab "$VOCAB" "$@"
