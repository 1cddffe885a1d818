"""Inference: gesture generation public API."""

from .generate import GesturePipeline, generate_gesture  # noqa: F401
