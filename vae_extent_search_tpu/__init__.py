"""vae_extent_search_tpu — a TPU-native rebuild of Jiw00n/vae-extent-search.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
reference (TenSet, a TVM fork whose headline experiment is a VAE-based
active-learning search over Ansor tensor-program schedules):

- ``ir``        tensor-expression-lite + Ansor-compatible schedule IR
                (loop state, 14 transform-step kinds, bound inference)
- ``records``   measure-record NDJSON serde, workload registry, search tasks
- ``features``  extent featurization + per-store program features
- ``models``    JAX models: VAE, latent cost predictor, segment-sum MLP,
                losses and ranking metrics
- ``search``    on-device active-learning candidate selection + sketch /
                evolutionary candidate generation
- ``parallel``  device-mesh runtime (pjit / shard_map over ICI+DCN)
- ``data``      dataset pipeline (LearningTask, splits, feature caches)

Reference behavior citations use ``file:line`` into the reference repo
(`/root/reference`, TVM fork) and are for parity documentation only.
"""

__version__ = "0.1.0"
