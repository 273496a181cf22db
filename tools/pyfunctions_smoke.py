#!/usr/bin/env python3
"""PySpark smoke test of the native Catalyst kernels: GraftExtensions
registers every graft.functions kernel session-wide, so plain Python
`spark.sql` reaches the codegen'd expressions and the two bounded-state
aggregates with zero Python-side glue. The Scala classes must be
compiled first (sbt compile).

Run: python3 tools/pyfunctions_smoke.py
Expected output ends with: PYTHON KERNELS OK
"""
import os

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .appName("pyfunctions-smoke")
         .config("spark.driver.extraClassPath",
                 os.path.abspath("target/scala-2.13/classes"))
         .config("spark.sql.extensions", "graft.plans.GraftExtensions")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

spark.createDataFrame(
    [(1, "the theory of the thing", [1.0, 2.0, 2.0]),
     (2, "a b a b a b", [3.0, 4.0, 0.0])],
    "id INT, text STRING, v ARRAY<DOUBLE>").createOrReplaceTempView("t")

# scalar kernels through plain SQL
row = spark.sql("""
  SELECT sqdist64(v, array(1.0D, 2.0D, 2.0D)) AS d,
         bpe_count(text, array('t h', 'th e')) AS n_bpe,
         size(shingles_k(text, 2)) AS n_shingles,
         count_in(split(text, ' '), array('the', 'a')) AS n_stop,
         normalize_text('  Qualité des Données!! ') AS norm,
         dsir_score(split(text, ' '), array(0.5D, -0.25D)) AS dsir
  FROM t WHERE id = 1""").collect()[0]
assert row.d == 0.0, row
assert row.n_bpe > 0, row
assert row.n_shingles > 0, row
assert row.n_stop == 2, row
assert row.norm == "qualite des donnees", row
assert isinstance(row.dsir, float), row

# bounded-state aggregates (map-side mergeable) through plain SQL
agg = spark.sql("""
  SELECT mg_heavy(w, 4) AS heavy,
         kmv_sketch(cast(conv(substr(md5(w), 1, 13), 16, 10) as bigint), 8) AS kmv
  FROM (SELECT explode(split(concat_ws(' ', collect_list(text)), ' ')) AS w FROM t)
""").collect()[0]
assert "the" in agg.heavy, agg
assert agg.kmv.n > 0, agg

spark.stop()
print("PYTHON KERNELS OK")
