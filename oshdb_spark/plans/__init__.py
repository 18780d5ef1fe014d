from oshdb_spark.plans.builder import ContributionView, SnapshotView

__all__ = ["SnapshotView", "ContributionView"]
