"""Production serving: HTTP daemon with dynamic micro-batching."""

from .server import GestureServer

__all__ = ["GestureServer"]
