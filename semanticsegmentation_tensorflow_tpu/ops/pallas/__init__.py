"""Pallas TPU kernels for the hot non-matmul paths.

Each kernel has a pure-jnp reference implementation in
``semanticsegmentation_tensorflow_tpu.ops`` and equality tests in
``tests/test_pallas.py`` (interpret mode on CPU, compiled on TPU).
"""

from semanticsegmentation_tensorflow_tpu.ops.pallas.overlay import (  # noqa: F401
    argmax_colormap_overlay_pallas,
)
