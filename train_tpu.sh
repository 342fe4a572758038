#!/usr/bin/env bash
# Single-host TPU training launch (the reference's train_dist.sh analog;
# one process drives all local chips via the jax single-controller runtime).
#
#   ./train_tpu.sh CONFIG DATASETS_JSON OUTPUT_DIR VOCAB [extra args...]
set -euo pipefail
CFG=$1; DATA=$2; OUT=$3; VOCAB=$4; shift 4
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
python main.py -c "$CFG" --datasets "$DATA" --output_dir "$OUT" \
  --vocab "$VOCAB" "$@"
