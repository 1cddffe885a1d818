"""Inference: gesture generation public API."""

from .generate import GesturePipeline, generate_gesture  # noqa: F401
from .streaming import StreamingSession  # noqa: F401
