"""Dump .explain('formatted') for every benched headline query.

Usage: python scripts/dump_plans.py <outdir> [suffix] [name ...]

Writes <outdir>/<name>_<suffix>.txt (suffix defaults to 'before') and a
summary TSV (<outdir>/summary_<suffix>.tsv) with per-plan node tallies:
Exchange count, join strategies, Python-eval nodes, scan pushdown lines.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouseocp_spark import get_spark
from clickhouseocp_spark.queries import all_queries

import bench


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:] or None
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    registry = all_queries()
    fns = bench._bench_fns(registry)
    if only:
        fns = {n: fns[n] for n in only}
    rows = []
    for name, fn in fns.items():
        spark.catalog.clearCache()
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # streaming queries can't explain pre-start
            plan = f"UNAVAILABLE: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        tally = {
            "exchange": len(re.findall(r"\bExchange\b", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "py": len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|"
                           r"FlatMapGroupsInPandas|MapInArrow", plan)
            ),
            "sort": len(re.findall(r"^\(\d+\) Sort\b", plan, re.M)),
            "scan": len(re.findall(r"Scan parquet", plan)),
        }
        rows.append((name, tally))
        print(name, tally, flush=True)
    with open(os.path.join(outdir, f"summary_{suffix}.tsv"), "w") as f:
        keys = ["exchange", "smj", "bhj", "shj", "bnlj", "cartesian", "py",
                "sort", "scan"]
        f.write("name\t" + "\t".join(keys) + "\n")
        for name, t in rows:
            f.write(name + "\t" + "\t".join(str(t[k]) for k in keys) + "\n")


if __name__ == "__main__":
    main()
