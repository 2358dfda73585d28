from .hellaswag import render_example, iterate_examples, HellaSwagEvaluator
from .cider import CiderScorer, cider_score
from .meteor import meteor_score, meteor_single
from .caption_eval import evaluate_captions

__all__ = [
    "render_example",
    "iterate_examples",
    "HellaSwagEvaluator",
    "CiderScorer",
    "cider_score",
    "meteor_score",
    "meteor_single",
    "evaluate_captions",
]
