"""Benchmarking: fused service harness + CPU golden reference recipes."""

from specenh.bench.harness import example_shot, make_enhance_shot_fn, time_fn  # noqa: F401
