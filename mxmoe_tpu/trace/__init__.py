"""Tracing & profiling subsystem (SURVEY.md §5a): gate/activation tracing
and the kernel performance-table profiler."""
