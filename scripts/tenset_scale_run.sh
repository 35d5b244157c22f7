#!/bin/bash
# TenSet-magnitude pipeline (docs/TENSET_SCALE.md): the reference
# workflow at its real scale, end to end, on framework CLIs only.
#   1. dump_network_info  - full 108-key network grid -> 1,912 tasks
#   2. dump_programs      - batch-size-1 preset (688 tasks) x N states
#   3. measure_programs   - analytic runner (TPU hosts don't run
#                           candidate CPU kernels; SURVEY §7)
#   4. make_dataset       - featurize to one corpus pkl (hold-out all_five)
# Training/eval steps are separate (train_model.py / eval_model_on_dataset.py)
# because they want the TPU; this script is pure-host and resumable
# (each stage skips existing outputs).
set -u
cd "$(dirname "$0")/.."
TARGET="llvm -mcpu=skylake-avx512"
N_STATES="${N_STATES:-3000}"

echo "=== stage 1: network info grid ==="
python scripts/dump_network_info.py --target "$TARGET"

echo "=== stage 2: dump programs (batch-size-1 preset, resumable) ==="
python scripts/dump_programs.py --all-tasks dataset/network_info/all_tasks.pkl \
  --batch-size-1 --target "$TARGET" --n-states "$N_STATES"

echo "=== stage 3: measure (analytic runner, resumable) ==="
python scripts/measure_programs.py --runner analytic --noise 0.05 --resume

echo "=== stage 4: make_dataset (hold-out all_five) ==="
if [ ! -f dataset/tenset_scale.pkl ]; then
  python scripts/make_dataset.py 'dataset/measure_records/*.json' \
    --out-file dataset/tenset_scale.pkl --target "$TARGET" \
    --hold-out all_five --min-sample-size 48
fi
echo "=== host pipeline done ==="
