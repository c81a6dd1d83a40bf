"""Utilities: metrics, observability, OpenCV probing."""

from specenh.utils.logging import MetricsLogger, SpanTimer, nan_guard, profile_trace, span  # noqa: F401
from specenh.utils.metrics import psnr, ssim  # noqa: F401
