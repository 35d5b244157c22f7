#!/bin/bash
# Multi-platform TenSet-magnitude pipeline: the reference dataset's
# 6-platform dimension (reference README.md:20-27) driven on analytic
# hardware profiles (search/platforms.py). Five platforms on the
# batch-size-1 network grid:
#   platinum-8272  — own llvm pools, low-fi analytic pricing
#   e5-2673        — re-measures the platinum pools (same-kind shared
#                    pool, like TenSet's k80/t4 sharing one cuda pool);
#                    schedule-aligned with platinum for tl_compare
#   graviton2      — OWN pools (64-core/NEON HardwareParams change the
#                    schedule space), low-fi pricing
#   k80 / t4       — one cuda pool (GPU sketch rules), both measured
#                    with the high-fidelity per-store roofline
# Stages are resumable (existing non-empty outputs are skipped).
# Downstream: make_dataset per platform + merged multi-target corpus,
# train_model --split-scheme by_target, tools/tl_compare.py.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS 2>/dev/null || true
N_STATES="${N_STATES:-2000}"
PLATINUM="llvm -mcpu=skylake-avx512"
GRAVITON="llvm -mtriple=aarch64-linux-gnu -mattr=+neon"
E5="llvm -mcpu=core-avx2"
K80="cuda -model=k80"
T4="cuda -model=t4"

echo "=== stage 1: network info grids (3 generation targets) ==="
python scripts/dump_network_info.py --target "$PLATINUM"
python scripts/dump_network_info.py --target "$GRAVITON"
python scripts/dump_network_info.py --target "$K80"

echo "=== stage 2a: platinum pools ==="
python scripts/dump_programs.py --all-tasks dataset/network_info/all_tasks.pkl \
  --batch-size-1 --only-target "$PLATINUM" --n-states "$N_STATES"
echo "=== stage 2b: cuda pools ==="
python scripts/dump_programs.py --all-tasks dataset/network_info/all_tasks.pkl \
  --batch-size-1 --only-target "$K80" --n-states "$N_STATES" \
  --out-folder dataset/to_measure_programs/cuda
echo "=== stage 2c: graviton2 pools (own schedule space) ==="
python scripts/dump_programs.py --all-tasks dataset/network_info/all_tasks.pkl \
  --batch-size-1 --only-target "$GRAVITON" --n-states "$N_STATES" \
  --out-folder dataset/to_measure_programs/graviton2

echo "=== stage 3: measure the five platforms ==="
python scripts/measure_programs.py --runner analytic --noise 0.05 --resume \
  --target "$PLATINUM"
python scripts/measure_programs.py --runner analytic --noise 0.05 --resume \
  --target "$E5"
python scripts/measure_programs.py --runner analytic --noise 0.05 --resume \
  --target "$GRAVITON" --in-folder dataset/to_measure_programs/graviton2
python scripts/measure_programs.py --runner analytic_hf --noise 0.05 --resume \
  --target "$K80" --in-folder dataset/to_measure_programs/cuda
python scripts/measure_programs.py --runner analytic_hf --noise 0.05 --resume \
  --target "$T4" --in-folder dataset/to_measure_programs/cuda
echo "=== multi-platform host pipeline done ==="
