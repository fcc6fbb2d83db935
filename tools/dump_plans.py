"""Dump .explain('formatted') for headline queries to plans/r17/.

Usage:
    python tools/dump_plans.py TAG [QUERY ...]

TAG is 'before' or 'after'. With no queries listed, dumps every
bench.py HEADLINE query. Output: plans/r17/<query>_<TAG>.txt — the
optimization-round evidence files referenced by OPTIMIZATION_r17.md.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from bench import HEADLINE
from graphkb_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = "/root/testdata/sf0.1"
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r17"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_plans")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
