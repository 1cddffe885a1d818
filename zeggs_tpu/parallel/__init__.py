"""Device mesh + sharding specs (the reference has no distributed layer;
this is the TPU-native scaling module, SURVEY.md §2 'net new')."""

from .mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    create_mesh_for_batch,
    replicated,
    shard_batch,
)
