"""Print recorded schedules as loop-nest text.

Parity: reference scripts/print_programs.py — ``return_all_states`` streams
records, rebuilds the full bound state, and yields (state text, cost),
filtering error records with cost > 1e6 (:22-49). This is the bridge that
feeds the extent featurization.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_extent_search_tpu.records import iter_records


def return_all_states(json_file, max_lines=None, cost_filter=1e6):
    """[(state, mean_cost)] for valid records (print_programs.py:22-49)."""
    out = []
    for rec in iter_records(json_file, max_lines):
        if not rec.res.costs or rec.res.costs[0] > cost_filter:
            continue
        st = rec.inp.recover_state(infer_bound=True)
        out.append((st, rec.res.mean_cost))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log", type=str)
    p.add_argument("--max-lines", type=int, default=None)
    p.add_argument("--idx", type=int, default=None)
    args = p.parse_args()

    states = return_all_states(args.log, args.max_lines)
    if args.idx is not None:
        states = [states[args.idx]]
    for i, (st, cost) in enumerate(states):
        print(f"=== program {i}  cost {cost:.6g} ===")
        print(st.to_str(True))


if __name__ == "__main__":
    main()
