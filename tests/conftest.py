import os
import sys

# Force a deterministic 8-device CPU mesh for all tests; TPU tests are
# driven separately by bench.py on real hardware.
#
# Env mutation alone is NOT enough here: the axon sitecustomize imports
# jax at interpreter startup (before conftest runs), so jax's config has
# already captured JAX_PLATFORMS=axon from the kernel env — a later
# os.environ write is silently ignored and the suite would run on the
# tunneled TPU backend (where e.g. the fused Pallas head kernel kicks in
# and bf16/f32 comparisons see different hardware-PRNG dropout masks).
# jax.config.update rebinds the platform as long as no backend has been
# initialized yet, which is guaranteed this early in the pytest run.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # skip the axon TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CI_LOGS = "/root/reference/tutorials/auto_scheduler/ci_logs"
