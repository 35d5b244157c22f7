#!/bin/bash
# Round-5 full-grid pipeline: close the TenSet 13,848-task magnitude
# (VERDICT r4 ask 1). The reference's 13,848 tasks come from the FULL
# network grid — batch sizes 1/2/4/8 and the image/seq ladders
# (reference scripts/dump_network_info.py:150-203) — across 6 hardware
# platforms (reference README.md:20-27). Rounds 3-4 only ever drove the
# 688-task batch-size-1 preset; this run adds the 1,224 batch>1 tasks
# per generation target and the sixth platform (AMD epyc-7452):
#
#   llvm pools (platinum HardwareParams) -> measured on platinum-8272,
#       e5-2673 and epyc-7452 (same-kind shared pool, like TenSet's
#       k80/t4 sharing one cuda pool)
#   graviton2 own pools (64-core/NEON HardwareParams change the space)
#   cuda pools -> measured on k80 and t4 (high-fidelity roofline)
#
# 1,912 tasks x 6 platforms = 11,472 task-platform pairs. New pools at
# 500 states/task (VERDICT r4 blesses 500-1,000 to bound host time);
# round-4 batch-1 pools/records are reused untouched via skip/--resume.
# Every stage is resumable: rerun the script after an interruption and
# it picks up where it left off.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS 2>/dev/null || true
N_STATES="${N_STATES:-500}"
PLATINUM="llvm -mcpu=skylake-avx512"
GRAVITON="llvm -mtriple=aarch64-linux-gnu -mattr=+neon"
E5="llvm -mcpu=core-avx2"
EPYC="llvm -mcpu=znver2"
K80="cuda -model=k80"
T4="cuda -model=t4"
ALL=dataset/network_info/all_tasks.pkl

stamp() { date '+%m-%d %H:%M:%S'; }

echo "[$(stamp)] === stage 2: full-grid pools (batch>1; batch-1 exist and skip) ==="
python scripts/dump_programs.py --all-tasks $ALL \
  --only-target "$PLATINUM" --n-states "$N_STATES"
python scripts/dump_programs.py --all-tasks $ALL \
  --only-target "$K80" --n-states "$N_STATES" \
  --out-folder dataset/to_measure_programs/cuda
python scripts/dump_programs.py --all-tasks $ALL \
  --only-target "$GRAVITON" --n-states "$N_STATES" \
  --out-folder dataset/to_measure_programs/graviton2

echo "[$(stamp)] === stage 3: measure the six platforms (resume) ==="
python scripts/measure_programs.py --runner analytic --noise 0.05 --resume \
  --target "$EPYC"
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

echo "[$(stamp)] === stage 4: per-platform full-grid datasets (500 rec/task) ==="
declare -A TGT=(
  ["platinum-8272"]="$PLATINUM"
  ["e5-2673"]="$E5"
  ["epyc-7452"]="$EPYC"
  ["graviton2"]="$GRAVITON"
  ["k80"]="$K80"
  ["t4"]="$T4"
)
for hw in epyc-7452 k80 platinum-8272 e5-2673 graviton2 t4; do
  out="dataset/dataset_${hw}_full_s500.pkl"
  if [ -s "$out" ]; then echo "exists, skip $out"; continue; fi
  python scripts/make_dataset.py "dataset/measure_records/$hw/"*.json \
    --out-file "$out" --target "${TGT[$hw]}" --n-measurement 500
done

echo "[$(stamp)] === stage 4b: hold-out k80 corpus (network-eval pretrain) ==="
out="dataset/dataset_k80_full_s500_ho.pkl"
if [ -s "$out" ]; then echo "exists, skip $out"; else
  python scripts/make_dataset.py "dataset/measure_records/k80/"*.json \
    --out-file "$out" --target "$K80" --n-measurement 500 --hold-out all_five
fi

echo "[$(stamp)] === full-grid host pipeline done ==="
