from .attention import sdpa, causal_sdpa, xla_sdpa
from .layers import layer_norm, linear, gelu_tanh, embed
# NOTE: the ring_attention FUNCTION is deliberately not re-exported here —
# it would shadow the `ops.ring_attention` submodule attribute that
# attention.sdpa (impl="ring") and tests import as a module.
from .ring_attention import set_ring_mesh

__all__ = [
    "sdpa",
    "causal_sdpa",
    "xla_sdpa",
    "layer_norm",
    "linear",
    "gelu_tanh",
    "embed",
    "set_ring_mesh",
]
