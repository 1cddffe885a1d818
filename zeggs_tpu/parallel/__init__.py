"""Device mesh + sharding specs (the reference has no distributed layer;
this is the TPU-native scaling module, SURVEY.md §2 'net new')."""

from .mesh import create_mesh, batch_sharding, replicated, shard_batch  # noqa: F401
