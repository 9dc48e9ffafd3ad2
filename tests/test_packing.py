"""pack_documents semantics (oracle parity runs in test_driver_parity
via `pack_documents_bins`)."""

from pyspark.sql import functions as F

from hipporag_spark.ops.packing import pack_documents


def test_pack_bins_respect_capacity_boundaries(spark):
    docs = spark.createDataFrame(
        [(i, 30) for i in range(10)], "doc_id long, tok long"
    )
    p = pack_documents(docs, "tok", "doc_id", capacity=100, num_shards=1)
    rows = sorted((r["doc_id"], r["start_offset"], r["bin_id"]) for r in p.collect())
    # offsets 0,30,60,90,120,... → bins 0,0,0,0,1,1,1,2,2,2
    assert [r[1] for r in rows] == [30 * i for i in range(10)]
    assert [r[2] for r in rows] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    # doc at offset 90 spills past 100 but belongs to bin 0 (starting bin)
    per_bin = {}
    for _, off, b in rows:
        per_bin.setdefault(b, 0)
        per_bin[b] += 30
    assert per_bin == {0: 120, 1: 90, 2: 90}


def test_pack_oversize_doc_gets_own_bin_region(spark):
    docs = spark.createDataFrame(
        [(1, 50), (2, 400), (3, 50)], "doc_id long, tok long"
    )
    p = pack_documents(docs, "tok", "doc_id", capacity=100, num_shards=1)
    got = {r["doc_id"]: r["bin_id"] for r in p.collect()}
    # doc2 starts at offset 50 (bin 0); doc3 starts at 450 → bin 4: the
    # oversize doc pushes subsequent bins forward instead of sharing
    assert got == {1: 0, 2: 0, 3: 4}


def test_pack_partition_stability(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 * 10 + 5).alias("tok")
    )
    a = sorted(map(tuple, pack_documents(docs, "tok", "doc_id", 200, 4).collect()))
    b = sorted(map(tuple, pack_documents(docs.repartition(11), "tok", "doc_id", 200, 4).collect()))
    assert a == b
