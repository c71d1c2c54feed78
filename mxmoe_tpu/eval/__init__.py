"""Accuracy evaluation (reference L2, ``mxmoe/quant/evaluator.py``)."""

from .evaluator import eval_ppl, eval_ppl_tokens  # noqa: F401
