"""Pure-functional compute kernels: quaternions, rot6d, FK, mel DSP, GRU."""

from . import fk, mel, quat, xform  # noqa: F401
