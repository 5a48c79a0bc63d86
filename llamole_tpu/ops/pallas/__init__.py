"""Pallas TPU kernels for the hot ops.

Each kernel ships with a jnp reference implementation; callers pick via
``use_pallas`` (default: on for TPU platforms, off elsewhere). Tests run
the kernels in interpret mode on CPU against the references.
"""

from .graph_attention import graph_attention, use_pallas_default
from .gin_aggregate import gin_aggregate
