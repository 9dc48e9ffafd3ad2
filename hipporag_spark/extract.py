"""Deterministic "OpenIE" extraction over repository content.

The reference extracts per-chunk named entities and (s, p, o) triples with an
LLM (``/root/reference/src/hipporag/information_extraction/openie_openai.py:45-128``)
fanned out over a thread pool (``openie_openai.py:135-210``). The matching
contract for this engine is the *graph-layer math downstream of extraction*
(SURVEY.md §7.0), so extraction itself is a deterministic vectorized pass:

- **entities**: unique phrases per chunk — reference
  ``misc_utils.py:84-95`` (``extract_entity_nodes``: subjects+objects of
  triples, per-chunk unique).
- **triples**: ``(module, "imports", lib)`` and ``(module, "defines", fn)``
  pairs recovered from the content grammar; validated/deduped exactly like
  ``utils/llm_utils.py:222-252`` (len==3 kept, per-chunk stable dedup).
- text normalization applied to every phrase before keying, exactly as
  ``HippoRAG.py:255`` applies ``text_processing``.

Primary path is pure JVM built-ins (``regexp_extract_all`` + array functions
→ whole-stage codegen). ``extract_triples_pandas`` is the Arrow/pandas-UDF
variant kept for content grammars that outgrow regexes; tests assert both
paths produce identical output.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .keys import chunk_key, text_process

TRIPLE_SCHEMA = "array<struct<s:string,p:string,o:string>>"


def _proc(c: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "))


def raw_triples(content: Column | str) -> Column:
    """``array<struct<s,p,o>>`` from the content grammar — JVM-side only."""
    c = F.col(content) if isinstance(content, str) else content
    module = F.regexp_extract(c, r"(?m)^module (\w+)", 1)
    imports = F.regexp_extract_all(c, F.lit(r"(?m)^import (\w+)"), 1)
    defs = F.regexp_extract_all(c, F.lit(r"(?m)^def (\w+)"), 1)
    t_imp = F.transform(
        imports, lambda m: F.struct(module.alias("s"), F.lit("imports").alias("p"), m.alias("o"))
    )
    t_def = F.transform(
        defs, lambda d: F.struct(module.alias("s"), F.lit("defines").alias("p"), d.alias("o"))
    )
    return F.concat(t_imp, t_def)


def processed_triples(content: Column | str) -> Column:
    """Triples with each phrase text-processed, invalid dropped, deduped.

    Mirrors ``HippoRAG.py:248-257`` (text_process applied to all triple
    members) + ``llm_utils.py:222-252`` (validation/dedup).
    """
    ts = raw_triples(content)
    ts = F.transform(
        ts,
        lambda t: F.struct(
            _proc(t["s"]).alias("s"), _proc(t["p"]).alias("p"), _proc(t["o"]).alias("o")
        ),
    )
    ts = F.filter(ts, lambda t: (F.length(t["s"]) > 0) & (F.length(t["o"]) > 0))
    return F.array_distinct(ts)


def chunk_entities(triples: Column | str) -> Column:
    """Per-chunk unique entity phrases = subjects ∪ objects of its triples,
    sorted (reference uses ``np.unique`` — sorted unique, ``misc_utils.py:84-95``)."""
    ts = F.col(triples) if isinstance(triples, str) else triples
    subs = F.transform(ts, lambda t: t["s"])
    objs = F.transform(ts, lambda t: t["o"])
    return F.array_sort(F.array_distinct(F.concat(subs, objs)))


def extract(repo_files: DataFrame) -> DataFrame:
    """repo_files → extraction table (FIXTURES.md F2 shape).

    Output: ``(chunk_id, passage, entities: array<string>,
    triples: array<struct<s,p,o>>, repo, content_sha256)``.
    One narrow, shuffle-free projection — scales linearly with input.
    """
    df = repo_files.withColumn("triples", processed_triples("content"))
    return df.select(
        chunk_key("content").alias("chunk_id"),
        F.col("content").alias("passage"),
        chunk_entities("triples").alias("entities"),
        "triples",
        "repo",
        "content_sha256",
    )


def extract_triples_pandas(repo_files: DataFrame) -> DataFrame:
    """Arrow-batched pandas variant of the triple extractor (`mapInPandas`).

    Same output as :func:`extract` — the slow-path escape hatch for content
    that needs real parsing. Batched regex via ``pandas.Series.str``; no
    per-row Python UDFs (BASELINE.json input_hint).
    """
    import hashlib
    import re

    proc = re.compile(r"[^a-z0-9 ]")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mods = pdf["content"].str.extract(r"(?m)^module (\w+)", expand=False).fillna("")
            imps = pdf["content"].str.findall(r"(?m)^import (\w+)")
            defs = pdf["content"].str.findall(r"(?m)^def (\w+)")
            rows = []
            for content, repo, sha, m, il, dl in zip(
                pdf["content"], pdf["repo"], pdf["content_sha256"], mods, imps, defs
            ):
                ms = proc.sub(" ", m.lower()).strip()
                triples, seen = [], set()
                for p, objs in (("imports", il), ("defines", dl)):
                    for o in objs:
                        os_ = proc.sub(" ", o.lower()).strip()
                        if ms and os_ and (ms, p, os_) not in seen:
                            seen.add((ms, p, os_))
                            triples.append({"s": ms, "p": p, "o": os_})
                ents = sorted({t["s"] for t in triples} | {t["o"] for t in triples})
                rows.append(
                    {
                        "chunk_id": "chunk-" + hashlib.md5(content.encode()).hexdigest(),
                        "passage": content,
                        "entities": ents,
                        "triples": triples,
                        "repo": repo,
                        "content_sha256": sha,
                    }
                )
            yield pd.DataFrame(rows)

    schema = (
        "chunk_id string, passage string, entities array<string>, "
        f"triples {TRIPLE_SCHEMA}, repo string, content_sha256 string"
    )
    return repo_files.mapInPandas(run, schema=schema)
