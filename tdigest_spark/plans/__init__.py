"""Physical planning helpers: checkpointed/resumable builds, skew handling."""

from .checkpoint import CheckpointedBuild
from .skew import salted_repartition, skew_report

__all__ = ["CheckpointedBuild", "salted_repartition", "skew_report"]
