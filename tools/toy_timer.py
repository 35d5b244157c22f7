"""Toy external timer for the CommandRunner measurement bridge.

Stands in for real out-of-process hardware timing (the reference's
LocalRunner/RPCRunner, measure.py:375-611): reads the record log the
CommandRunner hands it, replays each state through the deterministic
analytic cost simulator + hash noise, and writes one cost (seconds) per
line in input order — the CommandRunner wire contract
(search/measure.py::CommandRunner).

Failure injection for tests:
- ``TOY_TIMER_FAIL_EVERY=N``: write the string "error" for every Nth
  record (1-based), exercising the runner's bad-line -> error_no path.
- ``TOY_TIMER_SLEEP=S``: sleep S seconds before answering, exercising
  the runner timeout path.

Usage: python tools/toy_timer.py <in.json> <out.json> [repeat]

``repeat`` (appended by CommandRunner when its FLOP-dependent repeat
policy asks for > 1; reference measure_programs.py:107-120) makes the
timer emit that many comma-separated costs per line, like a real
multi-repeat hardware timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_extent_search_tpu.records import load_records  # noqa: E402
from vae_extent_search_tpu.search.measure import AnalyticRunner  # noqa: E402


def main():
    in_file, out_file = sys.argv[1], sys.argv[2]
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sleep = float(os.environ.get("TOY_TIMER_SLEEP", "0"))
    if sleep:
        time.sleep(sleep)
    fail_every = int(os.environ.get("TOY_TIMER_FAIL_EVERY", "0"))

    records = load_records(in_file)
    runner = AnalyticRunner(noise=0.2, repeat=repeat)
    lines = []
    for i, rec in enumerate(records):
        if fail_every and (i + 1) % fail_every == 0:
            lines.append("error")
            continue
        task = rec.inp.task
        state = rec.inp.recover_state(infer_bound=True)
        res = runner.run(task, [state])[0]
        lines.append(",".join(f"{c:.9g}" for c in res.costs))
    with open(out_file, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
