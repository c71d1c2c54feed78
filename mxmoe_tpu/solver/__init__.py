"""Bitwidth-allocation ILP (reference L5, ``mxmoe/quant/bits_solver.py``)."""

from .bits_solver import (  # noqa: F401
    solve_layer,
    solve_model,
    solve_model_level,
    SolveResult,
)
from .perf_model import PerfModel, AnalyticPerfModel, load_perf_table  # noqa: F401
