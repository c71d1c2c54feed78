"""Shared utilities (logging, registry)."""

from .logging import setup_logger, init_logger  # noqa: F401
