"""Serving runtime: KV cache, prefill/decode steps, batched generation.

Net-new vs the reference (a research pipeline with no serving stack —
SURVEY.md §0); built for the production-deployment target: static-shape
decode steps compiled once, quantized expert execution, slot-based
continuous batching.
"""

from .kv_cache import KVCache, init_kv_cache  # noqa: F401
from .engine import Engine, EngineConfig  # noqa: F401
