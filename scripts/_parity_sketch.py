"""Throwaway cross-engine parity check for HLL/CMS (Spark vs DuckDB)."""
import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dhr_spark.operators.sketches import (
    cms_counters, cms_lookup, hll_cardinality, hll_registers, hll_estimate,
)

SF = "/root/testdata/sf0.001"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
docs = spark.read.parquet(f"{SF}/documents.parquet")
tok = docs.select(
    "doc_id",
    F.explode(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
        )
    ).alias("term"),
)

# ---- HLL over distinct terms, p=6
est = hll_cardinality(tok.select("term"), "term", p=6).collect()[0]
exact = tok.select("term").distinct().count()
print("spark hll:", est.asDict(), "exact:", exact)

H60 = (
    "list_sum(list_transform(range(1, 16), j -> "
    "(strpos('0123456789abcdef', substr(md5({arg}), CAST(j AS INTEGER), 1)) - 1)::BIGINT"
    " * (16::BIGINT ^ (15 - j))::BIGINT))"
)
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
h = H60.format(arg="term")
sql = f"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                t -> t <> '')) AS term
  FROM documents
),
hashed AS (SELECT ({h}) AS h FROM tok),
pre AS (
  SELECT h % 64 AS bucket, (h // 64) % 16777216 AS sub FROM hashed
),
reg AS (
  SELECT bucket,
         max(CASE WHEN sub = 0 THEN 25
             ELSE strpos(lpad(bin(sub), 24, '0'), '1') END) AS register
  FROM pre GROUP BY 1
),
agg AS (
  SELECT count(*)::BIGINT AS used,
         coalesce(sum(1::BIGINT << (24 - register)), 0)::BIGINT AS present_pow
  FROM reg
)
SELECT 64 AS m, used, (64 - used)::BIGINT AS zeros,
       (present_pow + (64 - used) * 16777216)::BIGINT AS sum_pow,
       CAST(709000::BIGINT * 64 * 64 AS DOUBLE) * CAST(16777216 AS DOUBLE)
         / CAST(present_pow + (64 - used) * 16777216 AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS raw_est
FROM agg
"""
duck = con.execute(sql).fetchall()[0]
print("duck  hll:", duck)
srow = (est["m"], est["used"], est["zeros"], est["sum_pow"], est["raw_est"])
assert tuple(duck) == srow, (duck, srow)
print("HLL PARITY OK; rel err:", abs(est["raw_est"] - exact) / exact)

# ---- CMS over the token stream, items = 5 terms
ctr = cms_counters(tok, "term", depth=4, width=256)
items = tok.select("term").distinct().limit(5)
got = {
    r["term"]: r["est"]
    for r in cms_lookup(ctr, items, "term", depth=4, width=256).collect()
}
print("spark cms:", got)
names = list(got)
in_list = ", ".join(f"'{t}'" for t in names)
hd = H60.format(arg="d.d::VARCHAR || ':' || term")
sql2 = f"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                t -> t <> '')) AS term
  FROM documents
),
d AS (SELECT unnest(range(0, 4)) AS d),
ctr AS (
  SELECT d.d AS depth, ({hd}) % 256 AS bucket, count(*)::BIGINT AS cnt
  FROM tok, d GROUP BY 1, 2
),
probe AS (
  SELECT t.term, d.d AS depth, ({hd.replace('term', 't.term')}) % 256 AS bucket
  FROM (SELECT unnest([{in_list}]) AS term) t, d
)
SELECT p.term, min(c.cnt)::BIGINT AS est
FROM probe p JOIN ctr c USING (depth, bucket)
GROUP BY 1
"""
duck2 = dict(con.execute(sql2).fetchall())
print("duck  cms:", duck2)
assert duck2 == got, (duck2, got)
exact2 = dict(
    (r["term"], r["n"])
    for r in tok.filter(F.col("term").isin(names))
    .groupBy("term").agg(F.count("*").alias("n")).collect()
)
for t, e in got.items():
    assert e >= exact2[t], (t, e, exact2[t])
print("CMS PARITY OK; overestimates:", {t: got[t] - exact2[t] for t in got})
spark.stop()
