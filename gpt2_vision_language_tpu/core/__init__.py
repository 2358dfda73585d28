from .config import (
    GPTConfig,
    CLIPConfig,
    BridgeConfig,
    PretrainConfig,
    FinetuneConfig,
)
from .precision import Policy, DEFAULT_POLICY

__all__ = [
    "GPTConfig",
    "CLIPConfig",
    "BridgeConfig",
    "PretrainConfig",
    "FinetuneConfig",
    "Policy",
    "DEFAULT_POLICY",
]
