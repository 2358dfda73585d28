from . import gpt2

__all__ = ["gpt2"]
