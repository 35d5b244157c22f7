"""Generate candidate-schedule pools for tasks.

Parity: reference scripts/dump_programs.py:17-74 — per task, sample the
initial population and run repeated evolutionary search rounds collecting
unique states (default 4,000), wrap them as MeasureInputs with dummy
results and save to to_measure_programs/<task>.json.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.common import TO_MEASURE_PROGRAM_FOLDER, clean_name
from vae_extent_search_tpu.records import SearchTask, make_record, save_records
from vae_extent_search_tpu.search.sketch import make_states


def dump_task(task: SearchTask, out_file: str, n_states: int,
              seed: int = 2023):
    states = make_states(task, n_states, seed=seed)
    records = [
        make_record(task, st.transform_steps, costs=[0.0], timestamp=0)
        for st in states
    ]
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    if os.path.exists(out_file):
        os.remove(out_file)
    save_records(out_file, records)
    return len(records)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workload-key", type=str, required=True)
    p.add_argument("--target", type=str, default="llvm -mcpu=skylake-avx512")
    p.add_argument("--n-states", type=int, default=4000)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--seed", type=int, default=2023)
    args = p.parse_args()

    task = SearchTask(args.workload_key, args.target)
    out = args.out or os.path.join(
        TO_MEASURE_PROGRAM_FOLDER,
        clean_name((task.workload_key, task.target.split()[0])) + ".json",
    )
    n = dump_task(task, out, args.n_states, args.seed)
    print(f"dumped {n} states -> {out}")


if __name__ == "__main__":
    main()
