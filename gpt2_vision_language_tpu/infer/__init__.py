from .sampling import sample_top_k, sample_top_p, greedy
from .decode import generate, Decoder

__all__ = ["sample_top_k", "sample_top_p", "greedy", "generate", "Decoder"]
