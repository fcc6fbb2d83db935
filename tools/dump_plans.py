"""Dump .explain('formatted') for headline queries to plans/<round>/.

Usage:
    python tools/dump_plans.py TAG [--round rNN] [--nockpt] [QUERY ...]

TAG is 'before' or 'after' (any label works). With no queries listed,
dumps every bench.py HEADLINE query. Output:
plans/<round>/<query>_<TAG>.txt — the optimization-round evidence
files referenced by OPTIMIZATION_rNN.md. Default round: r18.

``--nockpt`` dumps the plan with materialize() short-circuited to a
no-op (session conf ``spark.graphkb.checkpoint.mode=none``): the
checkpoint boundary normally truncates the formatted plan at
``Scan ExistingRDD``, hiding everything upstream of the first
localCheckpoint (VERDICT r17 evidence gap #5). Plan-dump only — the
query is never executed here, so the exploding-lineage concern that
makes 'none' unusable for running iterative operators does not apply.
The file is suffixed ``_<TAG>_full.txt`` so the executed-shape dump
stays separate.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from bench import HEADLINE
from graphkb_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    nockpt = "--nockpt" in args
    if nockpt:
        args.remove("--nockpt")
    rnd = "r18"
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1]
        del args[i : i + 2]
    tag = args[0]
    names = args[1:] or HEADLINE
    sf_dir = "/root/testdata/sf0.1"
    out_dir = Path(__file__).resolve().parent.parent / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_plans")
    if nockpt:
        spark.conf.set("spark.graphkb.checkpoint.mode", "none")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        suffix = f"{name}_{tag}_full.txt" if nockpt else f"{name}_{tag}.txt"
        (out_dir / suffix).write_text(plan)
        print(f"wrote {name} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
