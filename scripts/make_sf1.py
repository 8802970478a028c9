"""Synthesize a 10x scale-REHEARSAL dataset (≈ sf1) from the sf0.1 driver
fixtures — for the SCALE_SF1.md empirical scale-up check ONLY (r9 verdict
#6).  Correctness oracles always run on the driver-generated fixtures; this
never feeds the CORRECTNESS gate.

Construction: 10 key-shifted copies of every linearly-scaling table (key
offsets = max(key)+1 per copy, so join fan-outs and selectivities are
preserved exactly); nation/region stay fixed (geography-bounded, as in
TPC-H).  Two content adjustments keep the workload shape honest at 10x:

- documents.text is word-PERMUTED per copy (stride-prime reindexing):
  verbatim replication would make every doc a 10-way cross-copy near-dup,
  inflating LSH pair counts ~43x — a data artifact, not a plan property.
  Permutation destroys cross-copy shingle similarity while keeping each
  copy's internal planted structure intact.
- embeddings get a tiny copy-dependent deterministic perturbation so ANN /
  KMeans structure grows like real data rather than 10 exact point stacks.

Tables are written as SINGLE parquet files (load_table reads footers with
pyarrow, which wants files, and the driver fixtures are single files too).

Usage: python scripts/make_sf1.py [dst_dir] [copies]   (defaults /tmp/sf1 10)
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

#: per-copy word-permutation strides (primes, mostly coprime with doc
#: lengths; copy 0 keeps the original text)
_STRIDES = [1, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clickhouseocp_spark.catalog import load_table

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("make-sf1")
        .getOrCreate()
    )
    os.makedirs(DST, exist_ok=True)

    def write_single(df, name: str) -> None:
        tmp = os.path.join(DST, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, part), os.path.join(DST, f"{name}.parquet"))
        shutil.rmtree(tmp)

    def replicate(name: str, shifts: dict[str, int], extra=None) -> None:
        base = load_table(spark, SRC, name)
        parts = []
        for i in range(COPIES):
            df = base
            for col, span in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * span))
            if extra is not None:
                df = extra(df, i)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write_single(out, name)
        print(f"  {name}: {COPIES}x written")

    def span(name: str, col: str) -> int:
        v = load_table(spark, SRC, name).agg(F.max(col)).collect()[0][0]
        return int(v) + 1

    # fixed dims: straight file copies
    for t in ("region", "nation"):
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )
        print(f"  {t}: copied (geography-bounded dim)")

    o = span("orders", "o_orderkey")
    c = span("customer", "c_custkey")
    s = span("supplier", "s_suppkey")
    p = span("part", "p_partkey")
    d = span("documents", "doc_id")
    v = span("embeddings", "vec_id")
    e = span("events", "event_id")
    u = span("events", "user_id")

    replicate("customer", {"c_custkey": c})
    replicate("supplier", {"s_suppkey": s})
    replicate("part", {"p_partkey": p})
    replicate("orders", {"o_orderkey": o, "o_custkey": c})
    replicate(
        "lineitem", {"l_orderkey": o, "l_partkey": p, "l_suppkey": s}
    )
    replicate("events", {"event_id": e, "user_id": u})

    def permute_text(df, i):
        stride = _STRIDES[i % len(_STRIDES)]
        if stride == 1:
            return df
        return df.withColumn(
            "text",
            F.expr(
                "array_join(transform(split(text, ' '), (__w, __j) -> "
                f"split(text, ' ')[pmod(__j * {stride}, size(split(text, ' ')))]"
                "), ' ')"
            ),
        )

    replicate("documents", {"doc_id": d}, extra=permute_text)

    def perturb_vec(df, i):
        if i == 0:
            return df
        return df.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (__x, __j) -> CAST(__x + "
                f"pmod({i} * 17 + __j, 7) * 0.001 AS FLOAT))"
            ),
        )

    replicate("embeddings", {"vec_id": v}, extra=perturb_vec)
    print(f"done: {DST} ({COPIES}x {SRC})")


if __name__ == "__main__":
    main()
