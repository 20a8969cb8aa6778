"""Substring-family scale probe (SCALE.md round-14 row): x96's window
explode and x99's incremental drop cost at a disk-resident 10x corpus.

Usage: python tools/substr_scale_probe.py   (writes under /tmp/substr_probe)

Replica text is word-tagged (each word suffixed _r{k}) so cross-replica
windows are DISTINCT — duplicate structure stays per-replica, the honest
growth model (x70's r13 probe discipline).  Writes 1x and 10x corpora to
disk, re-read so partitioning matches a real layout.
"""
import os, shutil, sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from hiveka_spark.session import get_spark
from hiveka_spark.catalog import table
from hiveka_spark.operators.dedup import substring_dup_spans
from hiveka_spark.operators.incremental import substring_index_update

spark = get_spark("substr-probe")
SF = "/root/testdata/sf0.1"
base = table(spark, SF, "documents").select("doc_id", "text")
root = "/tmp/substr_probe"
shutil.rmtree(root, ignore_errors=True)

def replicate(df, n):
    r = df.withColumn("_r", F.explode(F.lit(list(range(n)))))
    return (
        r.withColumn("doc_id", F.col("doc_id") + F.col("_r").cast("bigint") * 50_000_000)
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_r"), F.col("_r").cast("string")),
                ),
                " ",
            ),
        )
        .drop("_r")
    )

for n in (1, 10):
    replicate(base, n).write.mode("overwrite").parquet(f"{root}/c{n}")

# warm-up
spark.read.parquet(f"{root}/c1").count()

for n in (1, 10):
    d = spark.read.parquet(f"{root}/c{n}")
    t = time.time()
    out = substring_dup_spans(d, "text", "doc_id", min_len=10)
    ndup = out.filter(F.col("n_dup_spans") > 0).count()
    print(f"x96 {n}x: {time.time()-t:.1f}s, docs_with_dups={ndup}", flush=True)

# x99 drop cost: 5k-doc drop (95% novel, 5% planted cross-version exact dups)
drop_novel = replicate(base, 1).withColumn(
    "doc_id", F.col("doc_id") + 900_000_000
).withColumn(
    "text",
    F.array_join(
        F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit("_nv"))),
        " ",
    ),
).filter(F.col("doc_id") % 20 != 0)
drop_dup = spark.read.parquet(f"{root}/c1").filter(F.col("doc_id") % 20 == 0).withColumn(
    "doc_id", F.col("doc_id") + 900_000_000
)
drop = drop_novel.unionByName(drop_dup).localCheckpoint(eager=True)

for n in (1, 10):
    st = f"{root}/state{n}"
    shutil.rmtree(st, ignore_errors=True)
    d = spark.read.parquet(f"{root}/c{n}")
    substring_index_update(spark, d, st, version=1, min_len=10).count()  # build base
    t = time.time()
    rep = substring_index_update(spark, drop, st, version=2, min_len=10)
    ndup = rep.filter(F.col("n_dup_spans") > 0).count()
    print(f"x99 drop on {n}x base: {time.time()-t:.1f}s, drop_docs_with_dups={ndup}", flush=True)
