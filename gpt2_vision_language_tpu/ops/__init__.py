from .attention import sdpa, causal_sdpa, xla_sdpa
from .layers import layer_norm, linear, gelu_tanh, embed
from .ring_attention import ring_attention, set_ring_mesh

__all__ = [
    "sdpa",
    "causal_sdpa",
    "xla_sdpa",
    "layer_norm",
    "linear",
    "gelu_tanh",
    "embed",
    "ring_attention",
    "set_ring_mesh",
]
