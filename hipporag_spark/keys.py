"""Content-addressed keys and text normalization (Spark built-ins only).

Reference semantics reproduced here:

- ``text_processing``: lowercase, replace each non ``[A-Za-z0-9 ]`` char with
  a space, strip — ``/root/reference/src/hipporag/utils/misc_utils.py:54-59``.
- ``compute_mdhash_id``: ``prefix + md5(content)`` —
  ``/root/reference/src/hipporag/utils/misc_utils.py:115-126``; entity keys use
  prefix ``"entity-"``, chunk keys ``"chunk-"``
  (``/root/reference/src/hipporag/HippoRAG.py:763-764``,
  ``embedding_store.py:67``).
- sha256 per-row content invariant: BASELINE.json ``input_hint``.

All of these compile to JVM expressions (whole-stage codegen) — no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ENTITY_PREFIX = "entity-"
CHUNK_PREFIX = "chunk-"


def text_process(col: Column | str) -> Column:
    """``re.sub('[^A-Za-z0-9 ]', ' ', text.lower()).strip()`` as built-ins."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "))


def mdhash_key(col: Column | str, prefix: str) -> Column:
    """Content-addressed node key: ``prefix + md5(text)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(prefix), F.md5(c))


def entity_key(col: Column | str) -> Column:
    return mdhash_key(col, ENTITY_PREFIX)


def chunk_key(col: Column | str) -> Column:
    return mdhash_key(col, CHUNK_PREFIX)


def content_sha256(col: Column | str) -> Column:
    """Per-row invariant column (BASELINE.json input_hint)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)
