"""Physical planning helpers: checkpointed/resumable builds, skew handling."""

from .checkpoint import CheckpointedBuild

__all__ = ["CheckpointedBuild"]
