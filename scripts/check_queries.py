"""Dev loop: run every registry query against its DuckDB oracle.

Usage: python scripts/check_queries.py [--json out.json] [sf_dir] [name ...]

``--json`` writes a per-query artifact (the committed CHECKALL_r{N}.json
corroborating the driver's CORRECTNESS file across the FULL registry).
"""
import json
import sys

sys.path.insert(0, ".")
from clickhouseocp_spark import get_spark
from clickhouseocp_spark.testing import check_all

args = sys.argv[1:]
json_out = None
if "--json" in args:
    i = args.index("--json")
    json_out = args[i + 1]
    args = args[:i] + args[i + 2 :]
sf_dir = args[0] if args else "/root/testdata/sf0.001"
only = args[1:] or None
spark = get_spark("check_queries")
results = check_all(spark, sf_dir, only=only)
failed = [r for r in results if not r.ok]
if json_out:
    with open(json_out, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "total": len(results),
                "passed": len(results) - len(failed),
                "queries": {
                    r.name: {
                        "ok": r.ok,
                        "rows": r.spark_rows,
                        "oracle": r.oracle_rows,
                        "errors": r.errors[:3],
                    }
                    for r in results
                },
            },
            f,
            indent=1,
        )
print(f"\n{len(results) - len(failed)}/{len(results)} passed")
sys.exit(1 if failed else 0)
