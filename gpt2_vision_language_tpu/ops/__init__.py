from .attention import sdpa, causal_sdpa
from .layers import layer_norm, linear, gelu_tanh, embed

__all__ = ["sdpa", "causal_sdpa", "layer_norm", "linear", "gelu_tanh", "embed"]
