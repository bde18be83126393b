"""Functional ops the models are built from.

Everything here is pure-jnp / lax (XLA-fusable, static shapes). Pallas
implementations of the hot non-matmul ops live in
`semanticsegmentation_tensorflow_tpu.ops.pallas` with these as the reference
semantics.
"""

from semanticsegmentation_tensorflow_tpu.ops.pool import (  # noqa: F401
    max_pool,
    max_pool_with_argmax,
    max_unpool,
)
from semanticsegmentation_tensorflow_tpu.ops.shape import (  # noqa: F401
    pad_to_multiple,
    crop_to,
)
from semanticsegmentation_tensorflow_tpu.ops.overlay import (  # noqa: F401
    argmax_colormap_overlay,
)
