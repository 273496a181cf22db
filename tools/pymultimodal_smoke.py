#!/usr/bin/env python3
"""PySpark mapInPandas smoke test of the multimodal feature-extraction
plumbing (the Pandas-UDF twin of graft.operators.Multimodal, whose Scala
path uses mapPartitions): binary payload column in, vectorized pandas
batches through the decode stub, typed feature schema out. The decode is
the SAME deterministic byte-statistics stub as the Scala side (no media
libs in this container), so the two paths are cross-checked value-for-
value on the documents table.

Run: python3 tools/pymultimodal_smoke.py
Expected output ends with: MAPINPANDAS SURFACE OK
"""
import os

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = (SparkSession.builder.master("local[4]")
         .appName("pymultimodal-smoke")
         .config("spark.driver.extraClassPath",
                 os.path.abspath("target/scala-2.13/classes"))
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# media-blob table: same construction as Multimodal.q41 (text bytes as
# the opaque payload; ASCII, so codepoints == bytes)
blobs = spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
    "doc_id",
    "CASE WHEN doc_id % 3 = 0 THEN 'image' "
    "     WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type",
    "encode(text, 'UTF-8') AS payload")

OUT_SCHEMA = ("doc_id bigint, media_type string, width int, height int, "
              "n_frames int, n_bytes bigint, byte_sum bigint")


def decode_batches(batches):
    """Vectorized decode stub: one pandas DataFrame per Arrow batch in,
    one out. Mirrors Multimodal.decodeStub byte-for-byte."""
    import pandas as pd
    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "width": (n % 640 + 16).astype("int32"),
            "height": ((n * 7) % 480 + 16).astype("int32"),
            "n_frames": (n % 16 + 1).astype("int32"),
            "n_bytes": n.astype("int64"),
            "byte_sum": pdf["payload"].map(lambda b: sum(b)).astype("int64"),
        })


feats = blobs.mapInPandas(decode_batches, schema=OUT_SCHEMA)

rows = feats.count()
assert rows == blobs.count(), "1:1 blob -> feature rows"

# cross-check against pure-SQL byte stats (ASCII: ascii() of each char
# == payload byte), the same oracle trick q41 uses
expected = spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
    "doc_id",
    "length(text) AS n_bytes",
    "aggregate(split(text, ''), 0L, (acc, c) -> acc + ascii(c)) AS byte_sum")
diff = (feats.select("doc_id", "n_bytes", "byte_sum")
        .exceptAll(expected.select("doc_id", "n_bytes", "byte_sum")).count())
assert diff == 0, f"mapInPandas features diverge from SQL oracle on {diff} rows"

# partition behavior: batches stay executor-side, no driver collect
assert feats.rdd.getNumPartitions() >= 1
agg = feats.groupBy("media_type").count().collect()
assert sum(r["count"] for r in agg) == rows

spark.stop()
print("MAPINPANDAS SURFACE OK")
