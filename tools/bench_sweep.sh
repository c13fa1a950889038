#!/bin/bash
# Batch sweep for the decode megakernel (VERDICT r3 #1 "monotonic batch
# scaling"): runs bench.py at each batch with the engine's batch-aware
# stream default (u4 below DI_MK_I8_BATCH, i8 at/above) and appends one
# JSON line per point to $OUT. Packs are shared via /tmp/di_bench_pack_*;
# compiles land in the persistent /tmp/di_jax_cache.
set -u
OUT=${OUT:-BENCH_SWEEP_r04.json}
: > "$OUT"
for B in ${SWEEP_BATCHES:-16 32 64 128}; do
  echo "=== batch $B ===" >&2
  line=$(DI_BENCH_BATCH=$B timeout 1500 python bench.py 2> >(tail -5 >&2) | tail -1)
  echo "$line"
  echo "$line" >> "$OUT"
done
echo "sweep done -> $OUT" >&2
