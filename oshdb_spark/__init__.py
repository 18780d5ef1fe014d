"""oshdb_spark — a PySpark-native spatio-temporal spatial-join + tiling engine.

A from-scratch reimplementation of the query and data-processing
capabilities of OSHDB (reference: /root/reference, package
org.heigit.bigspatialdata, 0.6.0-SNAPSHOT) expressed as idiomatic
PySpark DataFrame plans: as-of joins for snapshots, lag windows for
contributions, cell-cover broadcast joins for areaOfInterest, and
(zoom, x, y) tile materialization — plus training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) that the reference does not have but a 100 TB corpus needs.

Nothing here is a port of the reference's Java execution engine; the
reference is cited in docstrings only to pin down *semantics*
(grid-cell math, contribution classification, zerofill, clipping).
"""

__version__ = "0.1.0"

from oshdb_spark.session import get_spark  # noqa: F401
