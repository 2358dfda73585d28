from .sampling import (
    sample_top_k,
    sample_top_p,
    sample_top_p_fast,
    top_p_keep_mask,
    greedy,
)
from .decode import generate, Decoder, cast_decode_params

__all__ = [
    "sample_top_k",
    "sample_top_p",
    "sample_top_p_fast",
    "top_p_keep_mask",
    "greedy",
    "generate",
    "Decoder",
    "cast_decode_params",
]
