"""hipporag_spark — a PySpark-native link-graph analytics engine.

Rebuilds the graph layer of HippoRAG (reference: takanori-ugai/HippoRAG,
studied read-only at /root/reference) from scratch on idiomatic Spark:

- an edge DataFrame ``edges(src, dst, weight, etype)`` + vertex DataFrame
  ``vertices(id, name, ntype, content)`` derived from a source-code
  repository table ``(repo, path, commit, lang, content)``,
- per-partition CSR blocks compiled with ``applyInPandas``,
- Personalized PageRank / connected components / label propagation /
  triangle count as iterative DataFrame jobs with explicit partitioning,
  salted-key skew mitigation, broadcast reset vectors, and per-superstep
  checkpoints carrying per-partition lineage + metrics.

Nothing here is a port: the reference is a single-process igraph engine
(``/root/reference/src/hipporag/HippoRAG.py``); this package re-expresses
the same computed semantics Spark-first.
"""

__version__ = "0.1.0"
