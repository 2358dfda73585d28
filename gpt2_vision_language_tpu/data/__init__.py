from .tokenizer import get_tokenizer, ByteFallbackTokenizer, GPT2_EOT
from .fineweb import TokenShardLoader, write_token_shard

__all__ = [
    "get_tokenizer",
    "ByteFallbackTokenizer",
    "GPT2_EOT",
    "TokenShardLoader",
    "write_token_shard",
]
