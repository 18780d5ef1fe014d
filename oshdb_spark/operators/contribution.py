"""Contribution view: typed change events between consecutive versions.

Spark-first re-expression of the reference's change extraction
(``oshdb-util/.../celliterator/CellIterator.java:437-711``):

* changeset collapsing — of several modifications sharing a changeset
  only the final one is a contribution (``OSHEntities.java:240-267``) —
  becomes a keep-last window filter per (entity, changeset);
* the sequential prev/curr walk becomes ``lag()`` columns over
  (entity ORDER BY version);
* contribution types replicate the reference classification:
  CREATION when the entity starts matching (first visible matching
  version, or a visible→visible transition out of non-matching,
  ``CellIterator.java:639-641``), DELETION when it stops
  (``CellIterator.java:532-551``) — including *filter-relative*
  deletions where the entity merely stops matching the tag/AOI
  predicate (``CellIterator.java:581-594,624-638``; semantics doc
  ``documentation/manual/views.md:48-52``) — TAG_CHANGE and
  GEOMETRY_CHANGE from column diffs (``CellIterator.java:646-668``).

The filter predicate participates in visibility ("effective
visibility" = visible AND matches), which is exactly what makes
snapshot deltas reconcile with contribution sums — the invariant
tested in ``tests/test_reconciliation.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CONTRIB_ORDER = ["CREATION", "TAG_CHANGE", "GEOMETRY_CHANGE", "DELETION"]


def collapse_changesets(versions: DataFrame, entity_col: str = "entity_id") -> DataFrame:
    """Keep only the last version of each CONSECUTIVE same-changeset
    run — the changeset-collapsing rule (``OSHEntities.java:240-267``:
    the reference walks newest-first and keeps a timestamp iff its
    changeset differs from the next-newer one, i.e. run-based, NOT
    grouped globally). The distinction matters only if a changeset id
    reappears non-consecutively in one entity's history — impossible in
    real OSM (changesets close) but the faithful semantics keep every
    version of the interrupted runs. One lead() window, no shuffle
    beyond the entity partitioning every caller already has."""
    w = Window.partitionBy(entity_col).orderBy("version")
    return (
        versions.withColumn("_next_cs", F.lead("changeset").over(w))
        .filter(~F.col("changeset").eqNullSafe(F.col("_next_cs")))
        .drop("_next_cs")
    )


def _canon(versions: DataFrame, col: str) -> Column:
    """Comparable form of a column: map columns become key-sorted entry
    arrays (Spark has no map equality; entry arrays of our maps are
    key-ascending by construction, so array equality IS map equality)."""
    from pyspark.sql.types import MapType

    if isinstance(versions.schema[col].dataType, MapType):
        return F.array_sort(F.map_entries(F.col(col)))
    return F.col(col)


def contributions(
    versions: DataFrame,
    predicate: Column | None = None,
    collapse: bool = True,
    entity_col: str = "entity_id",
    tag_cols: tuple[str, ...] | None = None,
    geom_cols: tuple[str, ...] = ("lon_e7", "lat_e7"),
    keep_before: tuple[str, ...] = (),
) -> DataFrame:
    """One row per contribution with a canonical ``contrib_type`` string.

    ``contrib_type`` values: 'CREATION', 'DELETION', 'TAG_CHANGE',
    'GEOMETRY_CHANGE', 'TAG_CHANGE,GEOMETRY_CHANGE' (both), or 'OTHER'
    (metadata-only change, the reference's empty type set). Rows where
    the entity is not effectively present on either side are dropped.

    One operator serves every entity shape: node versions (scalar
    coords + tags), way versions (coordinate ARRAYS, no tags — pass
    ``geom_cols=("lon_arr","lat_arr"), tag_cols=()``), or any custom
    schema, including ``tag_cols=("tags",)`` to diff the full tags map
    (map columns are canonicalized to key-sorted entry arrays; Spark has
    no map equality). The default diffs the scalar pair — the fixture's
    documented TAG_CHANGE signal (sources/versions.py).

    ``keep_before`` names diff columns whose PREVIOUS-version value is
    kept in the output as ``before_<col>`` — the
    ``getEntityBefore()``/``getGeometryBefore()`` surface of the
    reference (``OSMContribution.java:74-139``): NULL when the entity
    was absent or non-matching before the contribution (CREATION rows),
    the prior state otherwise, enabling before/after delta measures
    (e.g. length added per edit). Map columns surface in their
    canonicalized key-sorted entry-array form (the same shape the diff
    compares), not as maps.
    """
    v = versions
    if collapse:
        v = collapse_changesets(v, entity_col)
    if tag_cols is None:
        tag_cols = ("tag_building", "tag_v")
    match = predicate if predicate is not None else F.lit(True)
    v = v.withColumn("_match", F.col("visible") & match)

    diff_cols = list(tag_cols) + list(geom_cols)
    bad = set(keep_before) - set(diff_cols)
    if bad:
        raise ValueError(
            f"keep_before columns {sorted(bad)} are not diffed: keep_before "
            f"must be a subset of tag_cols + geom_cols ({diff_cols}) — only "
            "diffed columns carry a _prev_<col> state to report"
        )
    w = Window.partitionBy(entity_col).orderBy("version")
    v = v.withColumn("prev_match", F.lag("_match").over(w))
    for c in diff_cols:
        v = v.withColumn(f"_prev_{c}", F.lag(_canon(versions, c)).over(w))
    if "uid" in v.columns:
        v = v.withColumn("prev_uid", F.lag("uid").over(w))

    def changed(cols) -> Column:
        # null-safe: NULL-vs-value must count as a change (a plain `!=`
        # yields NULL there, and False|NULL stays NULL, silently turning
        # a real TAG/GEOMETRY_CHANGE into OTHER on schemas with nullable
        # diff columns)
        out = F.lit(False)
        for c in cols:
            out = out | ~_canon(versions, c).eqNullSafe(F.col(f"_prev_{c}"))
        return out

    curr = F.col("_match")
    prev = F.coalesce(F.col("prev_match"), F.lit(False))
    geom_changed = changed(geom_cols)
    tags_changed = changed(tag_cols)

    ctype = (
        F.when(curr & ~prev, F.lit("CREATION"))
        .when(~curr & prev, F.lit("DELETION"))
        .when(
            curr & prev & tags_changed & geom_changed,
            F.lit("TAG_CHANGE,GEOMETRY_CHANGE"),
        )
        .when(curr & prev & tags_changed, F.lit("TAG_CHANGE"))
        .when(curr & prev & geom_changed, F.lit("GEOMETRY_CHANGE"))
        .when(curr & prev, F.lit("OTHER"))
        .otherwise(F.lit(None))
    )

    out = v.withColumn("contrib_type", ctype).filter(
        F.col("contrib_type").isNotNull()
    )
    for c in keep_before:
        # _prev_<c> holds the canonicalized previous value; gate it on
        # prev_match so a CREATION (or previously non-matching entity)
        # reports no before-state, per the reference's null geometry
        out = out.withColumn(
            f"before_{c}", F.when(prev, F.col(f"_prev_{c}"))
        )
    return out.drop("_match", *[f"_prev_{c}" for c in diff_cols])


def attribute_contributors(
    own: DataFrame, child: DataFrame, entity_col: str = "entity_id"
) -> DataFrame:
    """Contributor attribution with child recursion
    (``OSMContribution.getContributorUserId``,
    ``OSMContribution.java:211-257``): the contribution stream of an
    entity whose children can change its geometry.

    ``own``: (entity_col, ts, uid) — the entity's OWN version instants
    with their editors. ``child``: (entity_col, ts, uid, member_ord) —
    child-version instants inside the entity's lifetime, one row per
    (member slot, child version). Returns (entity_col, ts, contrib_uid):

    * an instant that coincides with an own version is the entity
      editor's (the entity-timestamp check at
      ``OSMContribution.java:217-221``) — child rows at that instant
      are dropped;
    * a child-induced instant is attributed to the FIRST member in
      member order with a version at exactly that instant — the
      reference's ``getMemberEntities(ts).filter(ts ==
      contributionTs).findFirst()`` walk as a row_number pick over
      ``member_ord`` (ties broken by uid for cross-engine determinism;
      unreachable in the reference, where version timestamps are
      strictly ordered per entity).

    Scale shape: one left_anti hash join on (entity, ts) + one window
    over (entity, ts) groups that are at most members-per-entity wide.
    """
    keyed = child.join(
        own.select(entity_col, "ts"), [entity_col, "ts"], "left_anti"
    )
    w = Window.partitionBy(entity_col, "ts").orderBy("member_ord", "uid")
    attr = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(entity_col, "ts", F.col("uid").alias("contrib_uid"))
    )
    return own.select(
        entity_col, "ts", F.col("uid").alias("contrib_uid")
    ).unionByName(attr)
