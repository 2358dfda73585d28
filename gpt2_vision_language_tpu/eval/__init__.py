from .hellaswag import render_example, iterate_examples, HellaSwagEvaluator

__all__ = ["render_example", "iterate_examples", "HellaSwagEvaluator"]
