from . import gpt2
from . import bridges
from . import caption

__all__ = ["gpt2", "bridges", "caption"]
