#!/bin/bash
# Full validation battery (what the round-1 driver checks + goldens).
# CPU parts force the virtual 8-device mesh; bench runs on the real chip.
set -e
cd "$(dirname "$0")/.."

echo "=== native build ==="
bash scripts/build_native.sh

CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
MESH="XLA_FLAGS=--xla_force_host_platform_device_count=8"

echo "=== pytest (full battery; 'pytest -m fast' is the <2.5-min tier) ==="
# expected wall: ~25 min uncontended on this 1-core host, up to ~50 min
# under pipeline contention (the 66 slow-marked tests are ~93% of it)
$CPU_ENV $MESH python -m pytest tests/ -q

echo "=== SP-extent fidelity vs TVM oracles ==="
$CPU_ENV python tools/check_extent_fidelity.py | tail -1

echo "=== featurization throughput ==="
$CPU_ENV python tools/bench_featurize.py

echo "=== driver contract (entry + multichip dryrun) ==="
$CPU_ENV $MESH python -c "
import __graft_entry__ as g
fn, args = g.entry(); import jax; jax.jit(fn)(*args)
g.dryrun_multichip(8)
print('driver contract OK')"

echo "=== TPU bench ==="
python bench.py
