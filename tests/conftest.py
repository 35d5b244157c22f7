import os
import sys

# Force a deterministic 8-device CPU mesh for all tests; TPU tests are
# driven separately by bench.py on real hardware.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # skip the axon TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CI_LOGS = "/root/reference/tutorials/auto_scheduler/ci_logs"
