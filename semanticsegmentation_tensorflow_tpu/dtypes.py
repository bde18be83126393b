"""The compute-dtype policy constant, in a leaf module.

Params and accumulations are float32; matmul/conv inputs are bfloat16 (the
TPU MXU sweet spot — see models/common.py for the full policy note). Lives
here, import-dependency-free, so both `models/` and `ops/` can use it
without creating a models <-> ops import cycle.
"""

import jax.numpy as jnp

DEFAULT_DTYPE = jnp.bfloat16
