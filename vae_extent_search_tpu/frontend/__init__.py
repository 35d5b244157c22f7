"""Model -> SearchTask frontend: torch.fx graph tracing.

The reference extracts tuning tasks by building models through relay
(relay_integration.py:82-149, dump_network_info.py:27-62). The
TPU-native equivalent traces any torch.nn.Module with torch.fx, shape-
propagates an example input, and maps each compute node to a workload-
registry SearchTask — no hand-maintained shape tables required.
"""

from .torch_fx import extract_tasks_from_module  # noqa: F401
from .zoo import build_zoo_model, ZOO_BUILDERS  # noqa: F401
