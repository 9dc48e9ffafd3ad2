"""Stable block assignment shared by every iterative algorithm.

The packed per-block compilation itself lives in :mod:`.blocked`
(`BlockGraph`); this module keeps the one primitive everything agrees on:
how a vertex id maps to a block. Hash-mod keeps ranks/labels/components and
the compiled edge blocks co-partitioned on the same key at any scale, and
the mapping is a pure function of the id — independent of cluster size, so
two cluster sizes run identical physical plans (the scaling-comparison
prerequisite).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def block_of(col, num_blocks: int):
    """Stable block id for any id type (long vertex ids or string keys)."""
    return F.pmod(F.xxhash64(col), F.lit(num_blocks)).cast("int")
