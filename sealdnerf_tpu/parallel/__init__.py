"""Multi-chip scaling (the TPU-native replacement for the reference's
vestigial DDP plumbing, SURVEY.md §2.6)."""

from .mesh import make_mesh, replicate, shard_batch

__all__ = ["make_mesh", "replicate", "shard_batch"]
