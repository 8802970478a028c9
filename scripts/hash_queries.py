"""Dump an order-insensitive value hash per registry query — used to compare
runs across different parallelism configs (nondeterminism detector).

Usage: python scripts/hash_queries.py OUT.json
"""
import hashlib
import json
import sys

sys.path.insert(0, ".")
from clickhouseocp_spark import get_spark
from clickhouseocp_spark.queries import all_queries
from clickhouseocp_spark.testing import _canon_cell

sf_dir = "/root/testdata/sf0.01"
spark = get_spark("hash_queries")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name, q in sorted(all_queries().items()):
    try:
        df = q.fn(spark, sf_dir)
        cols = sorted(df.columns)
        idx = [df.columns.index(c) for c in cols]
        rows = sorted(
            (tuple(_canon_cell(r[i]) for i in idx) for r in df.collect()), key=repr
        )
        h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
        out[name] = {"rows": len(rows), "hash": h}
    except Exception as e:
        out[name] = {"error": str(e)[:200]}
    print(name, out[name], flush=True)
json.dump(out, open(sys.argv[1], "w"), indent=0)
