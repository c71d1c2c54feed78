"""Benchmark & verification harness (TPU analog of the reference's C++
``test.cu`` bench/check binary — SURVEY.md §2.2, §4)."""
