"""Dev loop: run every registry query against its DuckDB oracle.

Usage: python scripts/check_queries.py [sf_dir] [name ...]
"""
import sys

sys.path.insert(0, ".")
from clickhouseocp_spark import get_spark
from clickhouseocp_spark.testing import check_all

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
only = sys.argv[2:] or None
spark = get_spark("check_queries")
results = check_all(spark, sf_dir, only=only)
failed = [r for r in results if not r.ok]
print(f"\n{len(results) - len(failed)}/{len(results)} passed")
sys.exit(1 if failed else 0)
