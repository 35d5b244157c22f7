#!/bin/bash
# Downstream of scripts/fullgrid_run.sh (round-5 full-grid corpora):
#   A. hold-out (all_five) variants of every per-platform full-grid
#      dataset — cheap after stage 4, the per-file feature caches hit
#   B. 6-platform merged by_target training (train cuda-k80 + cuda-t4 +
#      llvm-avx2 + llvm-avx512 + llvm-znver2 = 5 platforms, test the
#      held-out graviton2 aarch64 target) — reference dataset.py:152-179
#      at 11,472 task-platform pairs
#   C. epyc-7452 within-task 90/10 metrics (the sixth platform's corpus)
#   D. k80 hold-out pretrain + held-out-network eval on the cuda grid
#      (reference eval_model_on_dataset.py:19-73) + merged-ho pretrain
#      and the same eval from the 6-platform model
# Chip-bound stages (train_model) run on the tunneled v5e; stages skip
# existing outputs so the script is resumable.
set -u
cd "$(dirname "$0")/.."
MIN_SAMPLE="${MIN_SAMPLE:-48}"
REC=dataset/measure_records
mkdir -p result/fullgrid

PLATINUM="llvm -mcpu=skylake-avx512"
GRAVITON="llvm -mtriple=aarch64-linux-gnu -mattr=+neon"
E5="llvm -mcpu=core-avx2"
EPYC="llvm -mcpu=znver2"
K80="cuda -model=k80"
T4="cuda -model=t4"
declare -A TGT=(
  ["platinum-8272"]="$PLATINUM" ["e5-2673"]="$E5" ["epyc-7452"]="$EPYC"
  ["graviton2"]="$GRAVITON" ["k80"]="$K80" ["t4"]="$T4"
)

stamp() { date '+%m-%d %H:%M:%S'; }

echo "[$(stamp)] === A: hold-out dataset variants (cache-hit builds) ==="
for hw in platinum-8272 e5-2673 epyc-7452 graviton2 k80 t4; do
  out="dataset/dataset_${hw}_full_s500_ho.pkl"
  if [ -s "$out" ]; then echo "exists, skip $out"; continue; fi
  JAX_PLATFORMS=cpu python scripts/make_dataset.py "$REC/$hw/"*.json \
    --out-file "$out" --target "${TGT[$hw]}" --n-measurement 500 \
    --hold-out all_five --min-sample-size "$MIN_SAMPLE"
done

echo "[$(stamp)] === B: 6-platform merged by_target (chip) ==="
# the raw 5.7M-record 6-way merge peaks >130 GB inside train_model
# (loaded pickles + flatten + embedding + pack copies) and OOM-killed
# the host; tools/merge_downsample.py streams one platform at a time
# into a 200-records/task merge sized for training
if [ -s result/fullgrid/xgb_by_target_5plat.pkl ]; then
  echo "exists, skip by_target"
else
  if [ ! -s dataset/dataset_merged6_s200.pkl ]; then
    JAX_PLATFORMS=cpu python tools/merge_downsample.py \
      dataset/dataset_merged6_s200.pkl 200 \
      dataset/dataset_platinum-8272_full_s500.pkl \
      dataset/dataset_e5-2673_full_s500.pkl \
      dataset/dataset_epyc-7452_full_s500.pkl \
      dataset/dataset_k80_full_s500.pkl \
      dataset/dataset_t4_full_s500.pkl \
      dataset/dataset_graviton2_full_s500.pkl
  fi
  python scripts/train_model.py --dataset dataset/dataset_merged6_s200.pkl \
    --split-scheme by_target --models xgb@mlp \
    2>&1 | tee result/fullgrid/by_target_train.log
  mv xgb.pkl result/fullgrid/xgb_by_target_5plat.pkl
  mv mlp.pkl result/fullgrid/mlp_by_target_5plat.pkl
fi

echo "[$(stamp)] === C: epyc-7452 within-task 90/10 (chip) ==="
if [ -s result/fullgrid/xgb_epyc_within.pkl ]; then
  echo "exists, skip epyc"
else
  python scripts/train_model.py \
    --dataset dataset/dataset_epyc-7452_full_s500.pkl \
    --split-scheme within_task --models xgb@mlp \
    2>&1 | tee result/fullgrid/epyc_within.log
  mv xgb.pkl result/fullgrid/xgb_epyc_within.pkl
  mv mlp.pkl result/fullgrid/mlp_epyc_within.pkl
fi

echo "[$(stamp)] === D1: k80 hold-out pretrain (chip) ==="
if [ -s result/fullgrid/xgb_k80_ho.pkl ]; then
  echo "exists, skip k80-ho"
else
  python scripts/train_model.py \
    --dataset dataset/dataset_k80_full_s500_ho.pkl \
    --split-scheme within_task --models xgb@mlp \
    2>&1 | tee result/fullgrid/k80_ho_train.log
  mv xgb.pkl result/fullgrid/xgb_k80_ho.pkl
  mv mlp.pkl result/fullgrid/mlp_k80_ho.pkl
fi

echo "[$(stamp)] === D2: held-out-network eval on the cuda grid ==="
for m in xgb mlp; do
  log="result/fullgrid/eval_networks_k80_${m}.log"
  if [ -s "$log" ]; then echo "exists, skip $log"; continue; fi
  JAX_PLATFORMS=cpu python scripts/eval_model_on_dataset.py \
    --model "result/fullgrid/${m}_k80_ho.pkl" --networks \
    --target "$K80" 2>&1 | tee "$log"
done

echo "[$(stamp)] === D3: merged-ho pretrain + eval (chip) ==="
if [ -s result/fullgrid/xgb_merged_ho.pkl ]; then
  echo "exists, skip merged-ho"
else
  if [ ! -s dataset/dataset_merged6_s200_ho.pkl ]; then
    JAX_PLATFORMS=cpu python tools/merge_downsample.py \
      dataset/dataset_merged6_s200_ho.pkl 200 \
      dataset/dataset_platinum-8272_full_s500_ho.pkl \
      dataset/dataset_e5-2673_full_s500_ho.pkl \
      dataset/dataset_epyc-7452_full_s500_ho.pkl \
      dataset/dataset_k80_full_s500_ho.pkl \
      dataset/dataset_t4_full_s500_ho.pkl \
      dataset/dataset_graviton2_full_s500_ho.pkl
  fi
  python scripts/train_model.py \
    --dataset dataset/dataset_merged6_s200_ho.pkl \
    --split-scheme within_task --models xgb@mlp \
    2>&1 | tee result/fullgrid/merged_ho_train.log
  mv xgb.pkl result/fullgrid/xgb_merged_ho.pkl
  mv mlp.pkl result/fullgrid/mlp_merged_ho.pkl
fi
for m in xgb mlp; do
  for tgt in k80 platinum-8272; do
    log="result/fullgrid/eval_networks_merged_${m}_${tgt}.log"
    if [ -s "$log" ]; then echo "exists, skip $log"; continue; fi
    JAX_PLATFORMS=cpu python scripts/eval_model_on_dataset.py \
      --model "result/fullgrid/${m}_merged_ho.pkl" --networks \
      --target "${TGT[$tgt]}" 2>&1 | tee "$log"
  done
done

echo "[$(stamp)] === full-grid downstream done ==="
