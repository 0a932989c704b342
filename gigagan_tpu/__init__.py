"""gigagan_tpu — a TPU-native (JAX/XLA/Pallas) GigaGAN framework.

Re-implements the full capability surface of lucidrains/gigagan-pytorch
(arXiv 2303.05511) with a TPU-first architecture: channels-last feature maps,
MXU-friendly adaptive convolutions, jitted alternating train steps with
`lax.scan` gradient accumulation, R1 via grad-of-grad, bf16 compute, and
`shard_map` data parallelism over a device mesh.
"""

__version__ = "0.1.0"

from gigagan_tpu import ops, utils  # noqa: F401
