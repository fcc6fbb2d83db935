"""CLI mirroring the reference's ``bin/load.js`` argparse surface
(SURVEY §3.1: /root/reference/bin/load.js:36-152, shared flags
src/cli.js:23-52) — a user of the reference drives this engine the same
way: one subcommand per loader family plus a query runner.

    python -m graphkb_spark.cli load ontology  vocab.json   --kb ./kb
    python -m graphkb_spark.cli load ncit      ncit.tsv     --kb ./kb
    python -m graphkb_spark.cli load obograph  doid.json    --kb ./kb
    python -m graphkb_spark.cli load owl       so.owl       --kb ./kb
    python -m graphkb_spark.cli query '{"target": "terms", ...}' --kb ./kb

``--max-records`` truncates input like the reference's test flag
(src/cli.js:44-49); counts print per class like getCreatedCounts
(src/graphkb.js:315-330).
"""

from __future__ import annotations

import argparse
import json
import sys

from graphkb_spark.kb import load_ontology_records, upsert_source
from graphkb_spark.kb_io import load_kb, save_kb
from graphkb_spark.session import get_spark


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--kb", default="./kb_tables", help="KB tables directory")
    p.add_argument("--source-name", default=None, help="source registry name")
    p.add_argument("--max-records", type=int, default=None)
    p.add_argument("--cpus", type=int, default=None)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="graphkb_spark")
    sub = ap.add_subparsers(dest="command", required=True)

    load = sub.add_parser("load", help="run a loader pipeline")
    lsub = load.add_subparsers(dest="loader", required=True)
    for name, help_ in [
        ("ontology", "generic ontology JSON (records list)"),
        ("ncit", "NCIt-style TSV"),
        ("obograph", "OBO-graph JSON (disease ontology shape)"),
        ("owl", "OWL/RDF-XML ontology"),
        ("oncotree", "versioned ontology JSON rows"),
    ]:
        p = lsub.add_parser(name, help=help_)
        p.add_argument("input", help="input file path")
        _add_common(p)

    q = sub.add_parser("query", help="run a filter-DSL query against the KB")
    q.add_argument("query_json", help="query envelope JSON (reference /query body)")
    _add_common(q)
    return ap


def run_load(args: argparse.Namespace) -> int:
    spark = get_spark("graphkb-load", cpus=args.cpus)
    kb = load_kb(spark, args.kb)
    source = args.source_name or args.loader
    kb = upsert_source(spark, kb, {"name": source})

    if args.loader == "ontology":
        records = spark.read.option("multiLine", "true").json(args.input)
        if args.max_records:
            records = records.limit(args.max_records)
        kb = load_ontology_records(spark, kb, records, source)
    elif args.loader == "ncit":
        from graphkb_spark.loaders.ncit import load_ncit
        from graphkb_spark.sources.readers import read_delim

        raw = read_delim(spark, args.input)
        if args.max_records:
            raw = raw.limit(args.max_records)
        kb, bad = load_ncit(spark, kb, raw, source)
        n_bad = bad.count()
        if n_bad:
            print(f"quarantined {n_bad} rows", file=sys.stderr)
    elif args.loader == "obograph":
        from graphkb_spark.loaders.ontology_files import load_obograph

        kb = load_obograph(spark, kb, args.input, source)
    elif args.loader == "owl":
        from graphkb_spark.loaders.ontology_files import load_owl

        kb = load_owl(spark, kb, args.input, source)
    elif args.loader == "oncotree":
        from graphkb_spark.loaders.oncotree import load_oncotree

        records = spark.read.option("multiLine", "true").json(args.input)
        kb = load_oncotree(spark, kb, records, source)
    else:  # pragma: no cover — argparse restricts choices
        raise SystemExit(f"unknown loader {args.loader}")

    save_kb(kb, args.kb)
    print(json.dumps({"counts": kb.counts, "terms": kb.terms.count(),
                      "edges": kb.edges.count()}))
    return 0


def run_query(args: argparse.Namespace) -> int:
    try:
        query = json.loads(args.query_json)
    except json.JSONDecodeError as exc:
        print(f"error: query is not valid JSON: {exc}", file=sys.stderr)
        return 2
    spark = get_spark("graphkb-query", cpus=args.cpus)
    kb = load_kb(spark, args.kb)
    out = kb.query(query)
    for row in out.toJSON().collect():
        print(row)
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "load":
        return run_load(args)
    return run_query(args)


if __name__ == "__main__":
    raise SystemExit(main())
