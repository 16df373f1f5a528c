"""hudiff_tpu: TPU-native antibody/nanobody humanization framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
TencentAI4S/HuDiff (order-agnostic autoregressive discrete diffusion for
antibody humanization), designed TPU-first:

- OA-ARDM forward corruption runs on device (vectorized, reproducible).
- The reverse (humanization) sampler is a single jitted ``lax.scan`` over
  positions, batching hundreds of candidates per device program.
- Training scales over a ``jax.sharding.Mesh`` (data + model axes).
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
from .tokenizer import Tokenizer  # noqa: F401
