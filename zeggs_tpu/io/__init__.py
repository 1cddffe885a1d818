"""Host-side I/O: BVH, WAV, checkpoints, torch interop."""
