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
   "queries": {...}, "sf": ..., "spark_total": N|null, "ratio": N|null,
   "capped": [...]}
(spark_total/ratio are filled from BENCH_r*.json if present, newest
round first, else from a SPARK_TOTAL env override.)

Runaway oracles: some headline queries (dedup_components,
ngram_jaccard) have DuckDB formulations that run >400 s at sf0.1 —
recursive-CTE connected components and exploded-shingle self-joins
collapse where Spark's blocked/iterative implementations finish in
seconds. Each oracle run is therefore capped at $ORACLE_CAP_SEC
(default 120 s, via con.interrupt); capped queries contribute the cap
to the total and are listed under "capped", making the printed total
an explicit LOWER bound and the ratio an UPPER bound on
spark/baseline. Set ORACLE_CAP_SEC=0 to disable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
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
    cap = float(os.environ.get("ORACLE_CAP_SEC", "120"))

    def timed_run(sql: str) -> float:
        """One capped execution; returns wall or inf if interrupted."""
        done = [False]

        def watchdog() -> None:
            t0 = time.time()
            while not done[0]:
                if cap and time.time() - t0 > cap:
                    con.interrupt()
                    return
                time.sleep(0.25)

        th = threading.Thread(target=watchdog, daemon=True)
        th.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            wall = time.time() - t0
        except Exception:
            wall = float("inf")
        done[0] = True
        th.join()
        return wall

    per_query: dict[str, float] = {}
    missing: list[str] = []
    capped: list[str] = []
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            # non-SQL-expressible entries (rows-only in the driver gate)
            missing.append(name)
            continue
        best = timed_run(sql)  # first run doubles as the warm
        if best != float("inf"):
            for _ in range(2):
                best = min(best, timed_run(sql))
        if best == float("inf"):
            capped.append(name)
            per_query[name] = cap  # lower bound contribution
        else:
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
        "capped": capped,
        "cap_sec": cap,
        "spark_total": spark_total,
        "ratio": round(spark_total / total, 3) if spark_total and total else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
