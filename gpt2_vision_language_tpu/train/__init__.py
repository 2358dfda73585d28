from .schedule import cosine_warmup_lr
from .optimizer import adamw_init, adamw_update, global_norm
from .step import make_train_step, make_eval_step

__all__ = [
    "cosine_warmup_lr",
    "adamw_init",
    "adamw_update",
    "global_norm",
    "make_train_step",
    "make_eval_step",
]
