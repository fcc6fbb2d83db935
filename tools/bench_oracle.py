"""DuckDB timing of the HEADLINE oracle set — the baseline side of the
2x bench gate, measured with the verdict's protocol (same parquet,
threads = bench CPUs, warm best-of-3 per query).

BASELINE.md defines the baseline as DuckDB running the same queries on
the same data, so promotion decisions for new headline queries must
see both sides: a 1 s Spark query whose oracle runs in 0.05 s spends
20x of gate margin even when it is pure per-stage floor. Run this next
to ``bench.py`` and track the ratio per round:

    python bench.py                  # -> spark headline_total
    python tools/bench_oracle.py     # -> duckdb headline_total + ratio

Prints ONE JSON line:
  {"metric": "oracle_headline_total", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "spark_total": N|null, "ratio": N|null}
(spark_total/ratio are filled from BENCH_r*.json if present, newest
round first, else from a SPARK_TOTAL env override.)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from bench import HEADLINE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    con = duckdb.connect()
    con.execute(f"SET threads = {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    per_query: dict[str, float] = {}
    missing: list[str] = []
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            # non-SQL-expressible entries (rows-only in the driver gate)
            missing.append(name)
            continue
        con.execute(sql).fetchall()  # warm (IO cache + plan)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        per_query[name] = round(best, 3)
    total = round(sum(per_query.values()), 3)
    spark_total = None
    if os.environ.get("SPARK_TOTAL"):
        spark_total = float(os.environ["SPARK_TOTAL"])
    else:
        benches = sorted(
            Path(__file__).resolve().parent.parent.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
            reverse=True,
        )
        for p in benches:
            try:
                parsed = json.loads(p.read_text()).get("parsed") or {}
                if parsed.get("value"):
                    spark_total = float(parsed["value"])
                    break
            except Exception:
                continue
    out = {
        "metric": "oracle_headline_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "no_oracle": missing,
        "spark_total": spark_total,
        "ratio": round(spark_total / total, 3) if spark_total and total else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
