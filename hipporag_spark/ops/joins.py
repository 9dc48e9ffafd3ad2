"""As-of join and range join — time-shaped joins Spark's built-in operator
set lacks, expressed as compositions of existing DataFrame ops (no UDFs,
no inequality-join blowup).

The reference has none of these (SURVEY §2.4 "not present"); they are part
of the task's training-data-pipeline mandate — event/feature alignment
("latest feature value as of each training example's timestamp") and
interval containment ("events inside each incident window") are the two
canonical time joins of a log-scale pipeline.

Scale design:

- **asof_join** — the naive formulation is an inequality join
  (``l.key = r.key AND r.ts <= l.ts`` + argmax), which Spark executes as a
  broadcast-nested-loop or a sort-merge with per-row rescans — quadratic
  per key. Instead: tag both sides, UNION, ONE shuffle on the key, and a
  per-key time-ordered window takes ``last(right_payload, ignorenulls)``
  over the preceding frame. Cost = one shuffle + one sort, identical to
  the sessionizer's shape; each key's history lands in one task, hot keys
  ride AQE skew-split. This is the standard distributed as-of plan
  (pandas ``merge_asof``'s semantics, re-expressed relationally).

- **range_join** — the naive ``point BETWEEN lo AND hi`` join is a
  cartesian filter. When intervals have bounded length (incident windows,
  feature-validity spans), bucketize: explode each interval into the
  ≤ ``len/bucket + 1`` coarse buckets it covers, equi-join points on
  bucket (+ optional key), then filter exact containment. Explode factor
  is bounded by interval length / bucket width, the join is a plain
  shuffled (or broadcast, for small interval sets) hash join, and
  Catalyst prunes/pushes as usual. Pick ``bucket_us`` ≈ the typical
  interval length so the blowup stays ~2×.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
    tolerance_us: int | None = None,
    strategy: str = "shuffle",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.ts <= left.ts`` within the same ``on`` key (pandas
    ``merge_asof(direction='backward')`` / DuckDB ``ASOF JOIN``
    semantics, match inclusive of equal timestamps). Unmatched left rows
    keep nulls. ``ts`` must be an integer-comparable column (epoch
    micros — see ``ops.sessions.epoch_us``) present in BOTH frames;
    ``right_cols`` are the right-side columns to carry, emitted as
    ``{prefix}{col}`` plus ``{prefix}{ts}``.

    Ties (two right rows with identical (key, ts)) resolve to the
    greatest carried payload struct — deterministic, where a plain
    inequality-join argmax would be arbitrary.

    ``strategy``:

    - ``"shuffle"`` (default) — tag-union + per-key ordered window: ONE
      shuffle of both sides on the key. The right choice when both sides
      are large (event-to-event alignment).
    - ``"broadcast"`` — for a SMALL right side (a feature/dimension
      table): collect each key's right rows into a sorted array,
      broadcast-hash-join it onto the left, and take the last array
      element with ``rts <= left.ts`` via JVM higher-order functions.
      The big left side is NEVER shuffled — the plan is scan → broadcast
      join → projection, which is what survives a 100 TB left input.
      Per-left-row cost is O(right rows for that key). Identical
      results (including the tie rule) to the shuffle strategy — pinned
      by tests.
    """
    if strategy == "broadcast":
        return _asof_join_broadcast(
            left, right, on, ts, right_cols, prefix, tolerance_us
        )
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(F.col(ts).alias("__rts"), *[F.col(c) for c in right_cols])
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__p", F.lit(None).cast(right.select(payload).schema[0].dataType)
    )
    r = right.select(
        *keys,
        F.col(ts),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    ltypes = {f.name: f.dataType for f in l.schema.fields}
    extra = [c for c in l.columns if c not in r.columns]
    u = l.unionByName(
        r.select(
            *r.columns, *[F.lit(None).cast(ltypes[c]).alias(c) for c in extra]
        )
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) → equal
    # timestamps match, matching DuckDB/pandas inclusive semantics; "__p"
    # last in the ordering makes equal-ts right duplicates deterministic
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts), F.col("__side"), F.col("__p"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    if tolerance_us is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col(ts) - F.col("__m.__rts") <= F.lit(int(tolerance_us)), F.col("__m")
            ),
        )
    out = matched.select(
        *left.columns,
        F.col("__m.__rts").alias(f"{prefix}{ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def _asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    prefix: str,
    tolerance_us: int | None,
) -> DataFrame:
    """Small-right as-of: per-key sorted payload arrays, broadcast onto
    the left, last element <= left.ts picked with filter/get — no shuffle
    of the left side, no Python in the row path."""
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(F.col(ts).alias("__rts"), *[F.col(c) for c in right_cols])
    # sort_array ascending on (rts, payload...) → the LAST qualifying
    # element is the greatest (rts, payload): same tie rule as the
    # window strategy's orderBy(..., __p) + last()
    arrs = right.groupBy(*keys).agg(
        F.sort_array(F.collect_list(payload)).alias("__arr")
    )
    j = left.join(F.broadcast(arrs), keys, "left")
    lts = F.col(ts)
    cand = F.filter(F.col("__arr"), lambda s: s["__rts"] <= lts)
    m = F.get(cand, F.size(cand) - 1)  # null when no element qualifies
    if tolerance_us is not None:
        m = F.when(lts - m["__rts"] <= F.lit(int(tolerance_us)), m)
    matched = j.withColumn("__m", m)
    return matched.select(
        *left.columns,
        F.col("__m.__rts").alias(f"{prefix}{ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_us: int = 3_600_000_000,
    on: str | Sequence[str] | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it
    (``start <= point <= end``, inclusive both ends), optionally also
    matching equality keys ``on``. Intervals must have bounded length
    relative to ``bucket_us`` for the bucket explode to stay small.
    Returns points columns + intervals columns.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    pb = points.withColumn(
        "__bucket", F.floor(F.col(point_ts) / F.lit(int(bucket_us))).cast("long")
    )
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(int(bucket_us))).cast("long"),
                F.floor(F.col(end_col) / F.lit(int(bucket_us))).cast("long"),
            )
        ),
    )
    joined = pb.join(ib, keys + ["__bucket"], "inner").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__bucket")
