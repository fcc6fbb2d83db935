"""DuckDB oracle SQL for every registry query (driver contract half 2).

Split out of ``__spark_entry__.py`` so the driver entry file stays
reviewable: ``__spark_entry__.oracle_sql()`` delegates verbatim to
:func:`build_oracles` here.  Every oracle is ANSI SQL DuckDB runs over
the same parquet tables the Spark query reads; computed fragments
(PII patterns, MinHash params, relevance tables, BPE/PageRank CTE
generators) are derived from the SAME package constants the Spark
operators use, so the two sides cannot drift independently.
"""

from __future__ import annotations

from graphkb_spark.functions.variant_names import RELEVANCE_ROWS
from graphkb_spark.operators import text as text_ops
from graphkb_spark.operators.corpus import PRETRAINED_BPE_MERGES
from graphkb_spark.operators.dedup import _mh_params


def _registry_values() -> str:
    """SOURCE_REGISTRY rendered as DuckDB VALUES rows matching
    SOURCE_SCHEMA (name, displayName, url, usage, version, sort)."""
    from graphkb_spark.sources.registry import SOURCE_REGISTRY

    def lit(v):
        return "CAST(NULL AS VARCHAR)" if v is None else "'" + v.replace("'", "''") + "'"

    rows = []
    for rec in SOURCE_REGISTRY.values():
        vals = [lit(rec.get(f)) for f in ("name", "displayName", "url", "usage")]
        vals.append("CAST(NULL AS VARCHAR)")  # version: unset in the registry
        s = rec.get("sort")
        vals.append("CAST(NULL AS INTEGER)" if s is None else str(s))
        rows.append("(" + ", ".join(vals) + ")")
    return ", ".join(rows)


def _pii_oracle_sql() -> str:
    """Compose the pii_redact oracle from PII_PATTERNS verbatim, so the
    SQL can never drift from the Spark patterns."""
    from graphkb_spark.operators.text import PII_PATTERNS

    sql = """
        WITH s0 AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 4 = 0 THEN ' contact bob@example.com now'
                              WHEN doc_id % 4 = 1 THEN ' call +1 604-555-0199 today'
                              WHEN doc_id % 4 = 2 THEN ' from 192.168.1.77 last night'
                              ELSE '' END AS t0
          FROM documents)"""
    prev = "s0"
    tcol = "t0"
    carry: list[str] = []
    for i, (kind, pattern, token) in enumerate(PII_PATTERNS, start=1):
        carry_cols = (", " + ", ".join(carry)) if carry else ""
        sql += f""",
        s{i} AS (
          SELECT doc_id{carry_cols},
                 CAST(len(regexp_extract_all({tcol}, '{pattern}')) AS INT) AS n_{kind},
                 regexp_replace({tcol}, '{pattern}', '{token}', 'g') AS t{i}
          FROM {prev})"""
        carry.append(f"n_{kind}")
        prev, tcol = f"s{i}", f"t{i}"
    sql += f"""
        SELECT doc_id, n_email, n_ip, n_phone, {tcol} AS text_redacted
        FROM {prev}"""
    return sql


def _civic_pipeline_ctes() -> str:
    """The civic_sync oracle's shared CTE pipeline (evidence synthesis,
    publication/disease/evidence-level resolution, relevance, therapy
    and DNF expansion) up to the ``final`` CTE — consumers append
    their own closing SELECT (and optionally more CTEs)."""
    return """
        WITH rel(evidence_type, direction, significance, relevance) AS (
          VALUES """ + ", ".join(
            "(" + ", ".join(repr(v) for v in row) + ")" for row in RELEVANCE_ROWS
        ) + """),
        ab_base AS (
          SELECT CAST(i AS INT) AS abstract_id,
                 CAST(2010 + i % 10 AS INT) AS year,
                 'Abstract ' || i AS name,
                 'asco-' || i AS sourceId,
                 'ab_' || i AS rid
          FROM range(400) t(i)),
        abstracts AS (
          SELECT * FROM ab_base
          UNION ALL
          SELECT abstract_id, year, name, sourceId, 'ab2_' || abstract_id
          FROM ab_base WHERE abstract_id % 50 = 3),
        pm AS (
          SELECT c_custkey, 'pm_' || c_custkey AS rid
          FROM customer WHERE c_custkey % 10 <> 7),
        ev AS (
          SELECT o_orderkey AS k,
                 'EID' || o_orderkey AS sourceId,
                 CASE WHEN o_orderkey % 4 = 0 THEN 'PUBMED'
                      WHEN o_orderkey % 4 IN (1, 2) THEN 'ASCO'
                      ELSE 'OTHER' END AS source_type,
                 o_custkey AS citation_id,
                 CAST(o_orderkey % 400 AS INT) AS aid,
                 CAST(2010 + (o_orderkey % 400) % 10
                      + CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS INT)
                   AS pub_year,
                 CASE WHEN o_orderkey % 5 <> 0
                      THEN 'https://meetings.asco.org/abstracts/asco-'
                           || (o_orderkey % 400) END AS source_url,
                 ['A','B','C','D','E'][o_orderkey % 5 + 1] AS lvl_letter,
                 CASE WHEN o_orderkey % 7 <> 0 THEN o_orderkey % 5 + 1 END AS rating,
                 CASE WHEN o_orderkey % 11 = 10 THEN 'mystery-' || o_orderkey
                      ELSE n.n_name END AS disease,
                 o_orderkey % 97 AS v,
                 ['PREDICTIVE','DIAGNOSTIC','PROGNOSTIC','FUNCTIONAL'][o_orderkey % 4 + 1]
                   AS evidence_type,
                 CASE WHEN o_orderkey % 2 = 0 THEN 'SUPPORTS'
                      ELSE 'DOES_NOT_SUPPORT' END AS direction,
                 ['SENSITIVITYRESPONSE','RESISTANCE','POSITIVE','POOR_OUTCOME',
                  'GAIN_OF_FUNCTION'][o_orderkey % 5 + 1] AS significance
          FROM orders o JOIN nation n ON n.n_nationkey = o.o_orderkey % 25
          WHERE o_orderkey % 3 = 0),
        asco_match AS (
          SELECT e.k, a.rid AS ab_rid
          FROM ev e JOIN abstracts a
            ON e.source_type = 'ASCO'
           AND e.aid = a.abstract_id
           AND e.pub_year = a.year
           AND (e.source_url IS NULL OR contains(e.source_url, a.sourceId))),
        asco_agg AS (
          SELECT k, count(*) AS n_asco, min(ab_rid) AS ab_rid
          FROM asco_match GROUP BY k),
        staged AS (
          SELECT e.*,
                 CASE WHEN e.source_type = 'PUBMED' THEN p.rid END AS pm_rid,
                 coalesce(a.n_asco, 0) AS n_asco, a.ab_rid,
                 lower(e.lvl_letter || coalesce(CAST(e.rating AS VARCHAR), ''))
                   AS lvl
          FROM ev e
          LEFT JOIN pm p ON e.source_type = 'PUBMED' AND e.citation_id = p.c_custkey
          LEFT JOIN asco_agg a ON e.k = a.k),
        resolved AS (
          SELECT s.*,
                 CASE WHEN source_type = 'PUBMED' AND pm_rid IS NULL
                        THEN 'PMID ' || citation_id || ' is not available'
                      WHEN source_type = 'ASCO' AND n_asco = 0
                        THEN 'failed to select the relevant abstract (' || aid || ')'
                      WHEN source_type = 'ASCO' AND n_asco > 1
                        THEN 'too many choices for abstract (' || aid || ')'
                      WHEN source_type NOT IN ('PUBMED', 'ASCO')
                        THEN 'unable to process non-pubmed/non-asco evidence type ('
                             || source_type || ')'
                 END AS pub_error,
                 coalesce(pm_rid, ab_rid) AS publication_rid,
                 CASE WHEN k % 11 <> 10 THEN 'dis_' || (k % 25) END AS disease_rid,
                 CASE WHEN k % 11 = 10 THEN 'disease not found: mystery-' || k
                 END AS disease_error,
                 md5('{"cls":"EvidenceLevel","name":"' || lvl
                     || '","source":"civic"}') AS evidence_level_rid
          FROM staged s),
        expanded AS (
          SELECT s.*, r.relevance, t.therapy, c.condition_set
          FROM resolved s
          LEFT JOIN rel r ON r.evidence_type = s.evidence_type
                         AND r.direction = s.direction
                         AND r.significance = s.significance,
               unnest(CASE WHEN s.k % 4 = 0 THEN ['tA', 'tB']
                           WHEN s.k % 4 = 1 THEN ['tC']
                           WHEN s.k % 4 = 2 THEN ['tA + tB']
                           ELSE [CAST(NULL AS VARCHAR)] END) AS t(therapy),
               unnest(CASE WHEN s.k % 9 = 0 THEN [['V' || s.v, 'V' || (s.v + 1)]]
                           WHEN s.k % 9 = 3 THEN [['V' || s.v], ['V' || (s.v + 1)]]
                           ELSE [['V' || s.v]] END) AS c(condition_set)),
        final AS (
          SELECT *,
                 list_sort(list_concat(condition_set,
                   list_filter([therapy, disease_rid], x -> x IS NOT NULL)))
                   AS conditions
          FROM expanded)
    """


def _bpe_oracle_sql(n_merges: int = 8, source: str = "documents") -> str:
    """DuckDB oracle for BPE training: the ``n_merges`` data-dependent
    rounds unrolled as chained MATERIALIZED CTEs. Each round recomputes
    weighted adjacent-pair counts over the current segmentation, takes
    the (count desc, left, right) argmax via scalar subqueries, and
    re-segments with a plain string ``replace`` — left-to-right
    non-overlapping, exactly BPE's merge semantics — over a
    sentinel-delimited encoding (each symbol wrapped chr(31)..chr(30),
    so matches can never straddle or prefix a symbol boundary).
    MATERIALIZED is load-bearing: inlining would expand the round chain
    exponentially (~5^rounds scans of ``documents``)."""
    sql = r"""
        WITH words AS MATERIALIZED (
          SELECT w, count(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
            FROM {source})
          WHERE w <> '' GROUP BY w),
        r0 AS MATERIALIZED (
          SELECT freq,
                 regexp_replace(w, '(.)', chr(31) || '\1' || chr(30), 'g') AS s
          FROM words)"""
    for k in range(n_merges):
        sql += f""",
        p{k} AS (
          SELECT l, r, CAST(sum(freq) AS BIGINT) AS c FROM (
            SELECT freq, lst[i] AS l, lst[i + 1] AS r FROM (
              SELECT freq,
                     list_transform(string_split(s, chr(31))[2:],
                                    x -> rtrim(x, chr(30))) AS lst
              FROM r{k}),
            unnest(generate_series(1, len(lst) - 1)) AS u(i))
          GROUP BY l, r),
        b{k} AS MATERIALIZED (
          SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
        r{k + 1} AS MATERIALIZED (
          SELECT freq, replace(s,
              chr(31) || (SELECT l FROM b{k}) || chr(30)
                || chr(31) || (SELECT r FROM b{k}) || chr(30),
              chr(31) || (SELECT l FROM b{k}) || (SELECT r FROM b{k})
                || chr(30)) AS s
          FROM r{k})"""
    sql += "\n" + "\n UNION ALL ".join(
        f'SELECT {k} AS step, l AS "left", r AS "right",'
        f" l || r AS merged, c AS pair_count FROM b{k}"
        for k in range(n_merges)
    )
    return sql.replace("{source}", source)


def _bpe_encode_oracle_sql() -> str:
    """DuckDB oracle for BPE encoding with the frozen
    ``PRETRAINED_BPE_MERGES`` artifact: apply each rule to every
    document as the same sentinel-delimited string replace the Spark
    operator uses (words separated by chr(29) so merges cannot cross a
    word boundary), and count surviving chr(31) symbol markers. No
    training CTEs — the artifact is a constant in both engines."""
    sql = """
        WITH doc0 AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(lower(text), '\\s+', chr(29), 'g'),
                   '([^' || chr(29) || '])',
                   chr(31) || '\\1' || chr(30), 'g') AS s
          FROM documents)"""
    k = 0
    for left, right in PRETRAINED_BPE_MERGES:
        sql += f""",
        doc{k + 1} AS (
          SELECT doc_id, replace(s,
              chr(31) || '{left}' || chr(30)
                || chr(31) || '{right}' || chr(30),
              chr(31) || '{left}{right}' || chr(30)) AS s
          FROM doc{k})"""
        k += 1
    sql += f"""
        SELECT doc_id,
               CAST(len(s) - len(replace(s, chr(31), '')) AS BIGINT)
                 AS n_tokens
        FROM doc{k}"""
    return sql


def _pagerank_oracle_sql(n_iter: int = 3, damping_pct: int = 85, scale: int = 10**12) -> str:
    """DuckDB oracle for fixed-point PageRank: the power-iteration
    rounds unrolled as chained CTEs. Pure integer arithmetic end to
    end (bigint micro-units, floor division — all inputs non-negative,
    so DuckDB ``//`` == Spark ``div``), so every round's ranks are
    bit-identical to the Spark trajectory with no FP caveats."""
    base = (100 - damping_pct) * scale // 100
    sql = f"""
        WITH e AS (
          SELECT p_partkey AS s, p_partkey // 10 AS d
          FROM part WHERE p_partkey >= 1),
        nodes AS (
          SELECT DISTINCT n AS node FROM (
            SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
        deg AS (SELECT s, count(*) AS deg FROM e GROUP BY s),
        r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank_fx FROM nodes)"""
    for k in range(n_iter):
        sql += f""",
        c{k + 1} AS (
          SELECT e.d AS node, CAST(sum(r.rank_fx // dg.deg) AS BIGINT) AS sm
          FROM e JOIN r{k} r ON r.node = e.s JOIN deg dg ON dg.s = e.s
          GROUP BY e.d),
        r{k + 1} AS (
          SELECT n.node,
                 CAST({base} + ({damping_pct} * coalesce(c.sm, 0)) // 100
                      AS BIGINT) AS rank_fx
          FROM r{k} n LEFT JOIN c{k + 1} c USING (node))"""
    sql += f"""
        SELECT node, round(rank_fx / {float(scale)}, 6) AS rank FROM r{n_iter}"""
    return sql


def _mh_side_ctes(prefix: str, where_sql: str, num_hashes: int = 32) -> str:
    """Signature/band/hashed-set CTEs for one corpus side of a MinHash
    oracle (digest-then-distinct hashed shingle sets, affine family
    minima, 16 bands of 2) — shared by the cross-corpus entries so the
    SQL can never drift from the single-corpus minhash_lsh oracle."""
    P = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_mh_params(num_hashes))
    )
    return f"""
            {prefix}words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents {where_sql}),
            {prefix}sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM {prefix}words),
            {prefix}ex AS (SELECT doc_id, unnest(s) AS shingle FROM {prefix}sh),
            {prefix}hx AS (
              SELECT doc_id,
                     ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h
              FROM {prefix}ex),
            {prefix}params(i, a, b) AS (VALUES {P}),
            {prefix}mh AS (
              SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
              FROM {prefix}hx, {prefix}params
              GROUP BY doc_id, i),
            {prefix}sig AS (SELECT doc_id, list(m ORDER BY i) AS sig
                            FROM {prefix}mh GROUP BY doc_id),
            {prefix}bands AS (
              SELECT doc_id, b,
                     md5(array_to_string(list_slice(sig, b*2 + 1, b*2 + 2), ',')) AS bhash
              FROM {prefix}sig, generate_series(0, 15) g(b)),
            {prefix}hset AS (
              SELECT doc_id, list_distinct(list(h)) AS hs
              FROM {prefix}hx GROUP BY doc_id)"""


def build_oracles() -> dict[str, str]:
    en = ", ".join(f"'{w}'" for w in text_ops.LANG_MARKERS["en"])
    lang_hits = {
        lang: (
            "len(list_filter(list_filter(string_split(lower(text), ' '), x -> x <> ''), "
            f"x -> list_contains([{', '.join(repr(w) for w in ws)}], x)))"
        )
        for lang, ws in text_ops.LANG_MARKERS.items()
    }
    # Morton interleave as arithmetic (x bits at even positions, y at
    # odd) — mirrors operators/layout.py:morton_interleave bit-for-bit.
    morton = " + ".join(
        f"((zx // {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((zy // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(16)
    )
    # one k-core peel round over edge CTE e{r}: degrees -> survivors ->
    # restricted edges (mirrors operators/graph.py:kcore, k=7)
    kcore_round = (
        "d{n} AS (SELECT node, count(*) AS c FROM "
        "(SELECT u AS node FROM e{p} UNION ALL SELECT v FROM e{p}) "
        "GROUP BY node), "
        "s{n} AS (SELECT node FROM d{n} WHERE c >= 7), "
        "e{n} AS (SELECT e.u, e.v FROM e{p} e "
        "JOIN s{n} a ON e.u = a.node JOIN s{n} b ON e.v = b.node)"
    )
    kcore_rounds = ", ".join(kcore_round.format(n=r + 1, p=r) for r in range(3))
    # one Lloyd round: assign (argmin distance, cluster tie-break) +
    # integer-scaled exact centroid means (mirrors
    # operators/clustering.py:kmeans_train bit-for-bit)
    kmeans_round = (
        "a{n} AS (SELECT p.id, c.cl, list_distance(p.v, c.v) AS d "
        "FROM pts p CROSS JOIN c{p} c), "
        "m{n} AS (SELECT id, min(d) AS md FROM a{n} GROUP BY id), "
        "s{n} AS (SELECT a.id, min(a.cl) AS cl FROM a{n} a "
        "JOIN m{n} m ON a.id = m.id AND a.d = m.md GROUP BY a.id), "
        "e{n} AS (SELECT s.cl, generate_subscripts(p.v, 1) AS pos, "
        "CAST(round(unnest(p.v) * 1000000000.0) AS BIGINT) AS vi "
        "FROM s{n} s JOIN pts p ON s.id = p.id), "
        "c{n} AS (SELECT cl, list(m ORDER BY pos) AS v FROM "
        "(SELECT cl, pos, round(CAST(sum(vi) AS DOUBLE) / count(*) "
        "/ 1000000000.0, 8) AS m FROM e{n} GROUP BY cl, pos) GROUP BY cl)"
    )
    kmeans_rounds = ", ".join(kmeans_round.format(n=r + 1, p=r) for r in range(2))
    # one fine-level Lloyd round of the two-level (hierarchical)
    # trainer: assignment is an equi-join on the coarse cell (each
    # point scores only its own cell's fine centroids — mirrors
    # operators/cluster.py:kmeans_train_two_level bit-for-bit)
    fine_round = (
        "fa{n} AS MATERIALIZED (SELECT p.id, p.cell, c.fcl, list_distance(p.v, c.v) AS d "
        "FROM ptsc p JOIN f{p} c ON p.cell = c.cell), "
        "fm{n} AS (SELECT id, min(d) AS md FROM fa{n} GROUP BY id), "
        "fs{n} AS (SELECT a.id, a.cell, min(a.fcl) AS fcl FROM fa{n} a "
        "JOIN fm{n} m ON a.id = m.id AND a.d = m.md GROUP BY a.id, a.cell), "
        "fe{n} AS (SELECT s.cell, s.fcl, generate_subscripts(p.v, 1) AS pos, "
        "CAST(round(unnest(p.v) * 1000000000.0) AS BIGINT) AS vi "
        "FROM fs{n} s JOIN pts p ON s.id = p.id), "
        "f{n} AS MATERIALIZED (SELECT cell, fcl, list(m ORDER BY pos) AS v FROM "
        "(SELECT cell, fcl, pos, round(CAST(sum(vi) AS DOUBLE) / count(*) "
        "/ 1000000000.0, 8) AS m FROM fe{n} GROUP BY cell, fcl, pos) "
        "GROUP BY cell, fcl)"
    )
    fine_rounds = ", ".join(fine_round.format(n=r + 1, p=r) for r in range(2))
    # Fellegi-Sunter EM unroll (mirrors operators/linkage.py:
    # fellegi_sunter_em): round 1 uses the literal init params as the
    # SAME IEEE expressions Spark evaluates (1.0 - 0.9, not 0.1);
    # round 2 pulls params from round 1's aggregate CTE.
    _fs_fields = ["nation", "segment", "balband"]

    def _fs_w_cte(n: int, m_of, u_of, p_of) -> str:
        pm = p_of
        pu = f"(1.0 - {p_of})"
        for f in _fs_fields:
            pm += (
                f" * (CASE WHEN agree_{f} THEN {m_of(f)}"
                f" ELSE (1.0 - {m_of(f)}) END)"
            )
            pu += (
                f" * (CASE WHEN agree_{f} THEN {u_of(f)}"
                f" ELSE (1.0 - {u_of(f)}) END)"
            )
        src = "fspairs" if n == 1 else f"fspairs, fsp{n - 1}"
        return (
            f"fsw{n} AS (SELECT "
            + ", ".join(f"agree_{f}" for f in _fs_fields)
            + f", CAST(round(({pm}) / (({pm}) + ({pu})), 9)"
            f" AS DECIMAL(38,12)) AS w FROM {src})"
        )

    def _fs_agg_ctes(n: int) -> str:
        swas = ", ".join(
            f"CAST(sum(CASE WHEN agree_{f} THEN w"
            f" ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) AS swa_{f}"
            for f in _fs_fields
        )
        params = ", ".join(
            f"round(swa_{f} / sw, 9) AS m_{f},"
            f" round((ta_{f} - swa_{f}) / (n - sw), 9) AS u_{f}"
            for f in _fs_fields
        )
        return (
            f"fss{n} AS (SELECT CAST(sum(w) AS DOUBLE) AS sw,"
            f" CAST(count(*) AS DOUBLE) AS n, {swas} FROM fsw{n}), "
            f"fsp{n} AS (SELECT {params}, round(sw / n, 9) AS p"
            f" FROM fss{n}, fst0)"
        )

    fs_em_rounds = ", ".join(
        _fs_w_cte(
            r,
            (lambda f: "0.9") if r == 1 else (lambda f, rr=r: f"m_{f}"),
            (lambda f: "0.1") if r == 1 else (lambda f, rr=r: f"u_{f}"),
            "0.5" if r == 1 else "p",
        )
        + ", "
        + _fs_agg_ctes(r)
        for r in (1, 2)
    )
    fs_em_final = " UNION ALL ".join(
        f"SELECT 'agree_{f}' AS field, m_{f} AS m_est, u_{f} AS u_est,"
        f" p AS p_est FROM fsp2"
        for f in _fs_fields
    )
    fs_em_totals = ", ".join(
        f"CAST(sum(CASE WHEN agree_{f} THEN 1 ELSE 0 END) AS DOUBLE) AS ta_{f}"
        for f in _fs_fields
    )
    # per-column profile row (mirrors operators/profile.py)
    prof_num = (
        "SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        "round(CAST(min({c}) AS DOUBLE), 6) AS min_num, "
        "round(CAST(max({c}) AS DOUBLE), 6) AS max_num FROM orders"
    )
    prof_str = (
        "SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num "
        "FROM orders"
    )
    profile_union = " UNION ALL ".join(
        (prof_num if num else prof_str).format(c=c)
        for c, num in [
            ("o_orderkey", True), ("o_custkey", True), ("o_orderstatus", False),
            ("o_totalprice", True), ("o_orderdate", False),
            ("o_orderpriority", False),
        ]
    )
    oracles = {
        # SemDeDup: the kmeans_train CTE chain (k=8, 2 Lloyd rounds)
        # + within-cluster cosine pairs, keep-lowest-id policy.
        "semantic_dedup": f"""
            WITH pts AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings),
            h AS (SELECT id, v,
                         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT
                           AS hh
                  FROM pts),
            i0 AS (SELECT id, v, hh FROM h ORDER BY hh ASC, id ASC LIMIT 8),
            c0 AS (SELECT CAST((SELECT count(*) FROM i0 j
                                WHERE j.hh < i.hh
                                   OR (j.hh = i.hh AND j.id < i.id)) AS INT) AS cl,
                          i.v AS v
                   FROM i0 i),
            {kmeans_rounds},
            af AS (SELECT p.id, c.cl, list_distance(p.v, c.v) AS d
                   FROM pts p CROSS JOIN c2 c),
            mf AS (SELECT id, min(d) AS md FROM af GROUP BY id),
            sfin AS (SELECT a.id, CAST(min(a.cl) AS INT) AS cl
                     FROM af a JOIN mf m ON a.id = m.id AND a.d = m.md
                     GROUP BY a.id),
            memb AS (SELECT sfin.id, sfin.cl, p.v
                     FROM sfin JOIN pts p USING (id)),
            prs AS (SELECT a.cl, a.id AS ia, b.id AS ib,
                           round(list_cosine_similarity(a.v, b.v), 4) AS sim
                    FROM memb a JOIN memb b
                      ON a.cl = b.cl AND a.id < b.id),
            kept AS (SELECT ib, min(ia) AS dup_of FROM prs
                     WHERE sim >= 0.35 GROUP BY ib),
            d2 AS (SELECT k.ib, k.dup_of, p.sim
                   FROM kept k JOIN prs p
                     ON p.ib = k.ib AND p.ia = k.dup_of)
            SELECT m.id AS vec_id, m.cl AS cluster,
                   d2.ib IS NULL AS keep, d2.dup_of, d2.sim AS dup_sim
            FROM memb m LEFT JOIN d2 ON m.id = d2.ib
        """,
        # SemDeDup with two-level (hierarchical) assignment: coarse
        # kmeans chain (k_coarse=3, the kmeans_round template), final
        # coarse assign -> cells, per-cell fine init (row_number over
        # (md5-prefix, id)), 2 fine rounds (equi-join on cell), flat
        # cluster numbering cell*3+fcl, then the identical
        # within-cluster cosine keep-lowest-id policy.
        "semantic_dedup_two": f"""
            WITH pts AS MATERIALIZED (SELECT vec_id AS id,
                         CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings),
            h AS MATERIALIZED (SELECT id, v,
                         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT
                           AS hh
                  FROM pts),
            i0 AS (SELECT id, v, hh FROM h ORDER BY hh ASC, id ASC LIMIT 3),
            c0 AS (SELECT CAST((SELECT count(*) FROM i0 j
                                WHERE j.hh < i.hh
                                   OR (j.hh = i.hh AND j.id < i.id)) AS INT) AS cl,
                          i.v AS v
                   FROM i0 i),
            {kmeans_rounds},
            caf AS (SELECT p.id, c.cl, list_distance(p.v, c.v) AS d
                    FROM pts p CROSS JOIN c2 c),
            cmf AS (SELECT id, min(d) AS md FROM caf GROUP BY id),
            cells AS MATERIALIZED (SELECT a.id, CAST(min(a.cl) AS INT) AS cell
                      FROM caf a JOIN cmf m ON a.id = m.id AND a.d = m.md
                      GROUP BY a.id),
            ptsc AS MATERIALIZED (SELECT p.id, p.v, c.cell
                     FROM pts p JOIN cells c USING (id)),
            f0 AS MATERIALIZED (SELECT cell,
                          CAST(row_number() OVER (PARTITION BY cell
                               ORDER BY hh ASC, id ASC) - 1 AS INT) AS fcl,
                          v
                   FROM h JOIN cells USING (id)
                   QUALIFY row_number() OVER (PARTITION BY cell
                           ORDER BY hh ASC, id ASC) <= 3),
            {fine_rounds},
            ff AS MATERIALIZED (SELECT p.id, p.cell, c.fcl,
                          list_distance(p.v, c.v) AS d
                   FROM ptsc p JOIN f2 c ON p.cell = c.cell),
            ffm AS (SELECT id, min(d) AS md FROM ff GROUP BY id),
            fin AS MATERIALIZED (SELECT a.id,
                           CAST(a.cell * 3 + min(a.fcl) AS BIGINT) AS cl
                    FROM ff a JOIN ffm m ON a.id = m.id AND a.d = m.md
                    GROUP BY a.id, a.cell),
            memb AS MATERIALIZED (SELECT fin.id, fin.cl, p.v
                     FROM fin JOIN pts p USING (id)),
            prs AS MATERIALIZED (SELECT a.cl, a.id AS ia, b.id AS ib,
                           round(list_cosine_similarity(a.v, b.v), 4) AS sim
                    FROM memb a JOIN memb b
                      ON a.cl = b.cl AND a.id < b.id),
            kept AS (SELECT ib, min(ia) AS dup_of FROM prs
                     WHERE sim >= 0.35 GROUP BY ib),
            d2 AS (SELECT k.ib, k.dup_of, p.sim
                   FROM kept k JOIN prs p
                     ON p.ib = k.ib AND p.ia = k.dup_of)
            SELECT m.id AS vec_id, m.cl AS cluster,
                   d2.ib IS NULL AS keep, d2.dup_of, d2.sim AS dup_sim
            FROM memb m LEFT JOIN d2 ON m.id = d2.ib
        """,
        # soft dedup (Muennighoff 2023): per-digest copy counts, weight
        # 1/n, md5-uniform hash-Bernoulli keep at rate 1/n — identical
        # planted duplicates (every 5th doc id-shifted by 100000)
        "soft_dedup": """
            WITH base AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text FROM documents
              WHERE doc_id % 5 = 0),
            d AS (SELECT doc_id, md5(text) AS dg FROM base),
            c AS (SELECT dg, count(*) AS n_copies FROM d GROUP BY dg)
            SELECT d.doc_id, c.n_copies,
                   round(1.0 / c.n_copies, 6) AS weight,
                   (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                         1, 8))::BIGINT AS DOUBLE)
                    / 4294967296.0) * c.n_copies < 1.0 AS keep
            FROM d JOIN c USING (dg)
        """,
        # UniMax waterfilling (Chung 2023): ascending cumulative window
        # over the stratum aggregate, crossover rank k, full epoch cap
        # below k / uniform remainder share at and above it
        "unimax_budget": """
            WITH c AS (SELECT lang AS stratum,
                              CAST(sum(n_chars) AS BIGINT) AS avail
                       FROM documents GROUP BY lang),
            r AS (SELECT stratum, avail,
                         row_number() OVER
                           (ORDER BY avail ASC, stratum ASC) AS rk,
                         sum(avail) OVER
                           (ORDER BY avail ASC, stratum ASC
                            ROWS UNBOUNDED PRECEDING) AS pref,
                         count(*) OVER () AS n
                  FROM c),
            f AS (SELECT *,
                         CAST(avail AS DOUBLE) * 2.0 * (n - rk + 1)
                           > 250000.0 - CAST(pref - avail AS DOUBLE) * 2.0
                           AS x
                  FROM r),
            k AS (SELECT rk AS k, CAST(pref - avail AS DOUBLE) AS p, n
                  FROM f WHERE x ORDER BY rk LIMIT 1),
            a AS (SELECT f.stratum, f.avail,
                         CASE WHEN k.k IS NULL OR f.rk < k.k
                              THEN floor(CAST(f.avail AS DOUBLE) * 2.0
                                         * 10000) / 10000
                              ELSE floor((250000.0 - k.p * 2.0)
                                         / (k.n - k.k + 1) * 10000) / 10000
                         END AS alloc
                  FROM f LEFT JOIN k ON TRUE)
            SELECT stratum AS lang, avail AS avail_tokens,
                   alloc AS alloc_tokens,
                   floor(alloc / avail * 1000000) / 1000000 AS epochs
            FROM a
        """,
        # materialized UniMax mixture: the unimax_budget chain + the
        # per-stratum md5-ordered running-token cut; n_repeats = full
        # passes + 1 if inside the partial-pass prefix
        "unimax_sample": """
            WITH c AS (SELECT lang AS stratum,
                              CAST(sum(n_chars) AS BIGINT) AS avail
                       FROM documents GROUP BY lang),
            r AS (SELECT stratum, avail,
                         row_number() OVER
                           (ORDER BY avail ASC, stratum ASC) AS rk,
                         sum(avail) OVER
                           (ORDER BY avail ASC, stratum ASC
                            ROWS UNBOUNDED PRECEDING) AS pref,
                         count(*) OVER () AS n
                  FROM c),
            f AS (SELECT *,
                         CAST(avail AS DOUBLE) * 2.0 * (n - rk + 1)
                           > 250000.0 - CAST(pref - avail AS DOUBLE) * 2.0
                           AS x
                  FROM r),
            k AS (SELECT rk AS k, CAST(pref - avail AS DOUBLE) AS p, n
                  FROM f WHERE x ORDER BY rk LIMIT 1),
            a AS (SELECT f.stratum, f.avail,
                         CASE WHEN k.k IS NULL OR f.rk < k.k
                              THEN floor(CAST(f.avail AS DOUBLE) * 2.0
                                         * 10000) / 10000
                              ELSE floor((250000.0 - k.p * 2.0)
                                         / (k.n - k.k + 1) * 10000) / 10000
                         END AS alloc
                  FROM f LEFT JOIN k ON TRUE),
            base AS (SELECT lang, doc_id,
                            CAST(n_chars AS BIGINT) AS n_tokens,
                            md5(CAST(doc_id AS VARCHAR)) AS kk
                     FROM documents),
            cum AS (SELECT lang, doc_id, n_tokens,
                           sum(n_tokens) OVER
                             (PARTITION BY lang
                              ORDER BY kk ASC, doc_id ASC
                              ROWS UNBOUNDED PRECEDING) AS cumt
                    FROM base),
            j AS (SELECT c2.lang, c2.doc_id, c2.n_tokens,
                         CAST(floor(a.alloc / a.avail)
                              + CASE WHEN c2.cumt <= a.alloc
                                     - floor(a.alloc / a.avail) * a.avail
                                     THEN 1 ELSE 0 END AS INT) AS n_repeats
                  FROM cum c2 JOIN a ON c2.lang = a.stratum)
            SELECT lang, doc_id, n_tokens, n_repeats
            FROM j WHERE n_repeats >= 1
        """,
        # band planner over PPJoin exact-Jaccard pairs (>= 0.5):
        # decimal-summed S-curve mean per (b, r) factorization of 64.
        "lsh_band_tuning": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            pr AS (
              SELECT round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                           / len(list_distinct(list_concat(a.s, b.s))), 4) AS s
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
            cfg AS (SELECT CAST(b AS BIGINT) AS bands,
                           CAST(64 // b AS BIGINT) AS rows_per_band
                    FROM unnest([1, 2, 4, 8, 16, 32, 64]) AS t(b)),
            sc AS (SELECT bands, rows_per_band, s,
                          1.0 - power(1.0 - power(s, rows_per_band), bands)
                            AS p,
                          power(1.0 - power(0.5, 1.0 / bands),
                                1.0 / rows_per_band) AS s50
                   FROM pr, cfg)
            SELECT bands, rows_per_band,
                   round(max(s50), 4) AS s50,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   round(CAST(sum(CAST(round(p, 9) AS DECIMAL(38,12)))
                              AS DOUBLE) / count(*), 6) AS exp_recall,
                   CAST(sum(CASE WHEN p >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_likely
            FROM sc GROUP BY bands, rows_per_band
        """,
        # CCNet tertile bucketing over the bigram-LM scores; cutoffs
        # are exact linear-interpolation percentiles rounded to 6.
        "perplexity_buckets": """
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS t
              FROM documents),
            bg AS (
              SELECT doc_id, t[i] AS w1,
                     array_to_string(t[i:i+1], ' ') AS bigram
              FROM tok, unnest(generate_series(1, greatest(len(t) - 1, 0)))
                          AS u(i)),
            c2 AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
            c1 AS (SELECT w1, count(*) AS c FROM bg GROUP BY w1),
            scored AS (
              SELECT bg.doc_id,
                     log2(CAST(c2.c AS DOUBLE) / c1.c) AS lp
              FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1)),
            sc AS (SELECT doc_id, round(avg(lp), 6) AS avg_log2_prob,
                          count(*) AS n_bigrams
                   FROM scored GROUP BY doc_id),
            cuts AS (SELECT round(quantile_cont(avg_log2_prob, 1.0/3), 6)
                              AS p33,
                            round(quantile_cont(avg_log2_prob, 2.0/3), 6)
                              AS p67
                     FROM sc)
            SELECT doc_id, avg_log2_prob, n_bigrams,
                   CASE WHEN avg_log2_prob >= p67 THEN 'head'
                        WHEN avg_log2_prob >= p33 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM sc, cuts
        """,
        # Heaps fit over 3-gram shingles: the oracle may use a plain
        # window cumsum for doc offsets (Spark side uses the two-phase
        # range-bucket prefix sum); decimal-summed OLS moments.
        "heaps_fit": """
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS w
              FROM documents),
            tw AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE [array_to_string(w[i:i+2], ' ')
                                for i in generate_series(1, len(w) - 2)]
                     END AS t
              FROM tok WHERE len(w) > 0),
            docs AS (SELECT doc_id, len(t) AS n FROM tw WHERE len(t) > 0),
            o AS (SELECT doc_id,
                         sum(n) OVER (ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - n AS doff
                  FROM docs),
            pos AS (SELECT t[i] AS token, o.doff + i AS gp
                    FROM tw JOIN o USING (doc_id),
                         unnest(generate_series(1, len(t))) AS u(i)),
            fp AS (SELECT token, min(gp) AS fpos FROM pos GROUP BY token),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM docs),
            bks AS (SELECT ((fpos - 1) * 16) // N + 1 AS j,
                           count(*) AS bc
                    FROM fp, tot GROUP BY 1),
            cps AS (SELECT N, j, (N * j + 15) // 16 AS cp
                    FROM tot, unnest(generate_series(1, 16)) AS s(j)),
            curve AS (SELECT c.j, c.cp, c.N,
                             CAST(sum(coalesce(b.bc, 0)) OVER (
                               ORDER BY c.j ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS DOUBLE) AS v
                      FROM cps c LEFT JOIN bks b ON b.j = c.j),
            g AS (SELECT CAST(count(*) AS DOUBLE) AS c,
                         CAST(max(v) AS BIGINT) AS vocab,
                         max(N) AS N,
                         CAST(sum(CAST(round(ln(CAST(cp AS DOUBLE)), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sx,
                         CAST(sum(CAST(round(ln(v), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sy,
                         CAST(sum(CAST(round(ln(CAST(cp AS DOUBLE))
                              * ln(CAST(cp AS DOUBLE)), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
                         CAST(sum(CAST(round(ln(CAST(cp AS DOUBLE)) * ln(v), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
                         CAST(sum(CAST(round(ln(v) * ln(v), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS syy
                  FROM curve)
            , g2 AS (SELECT N, vocab, c, sx, sy,
                          c * sxy - sx * sy AS num,
                          c * sxx - sx * sx AS den,
                          c * syy - sy * sy AS deny
                   FROM g),
            g3 AS (SELECT N, vocab, c, sx, sy, num, den, deny,
                          CASE WHEN deny = 0 THEN 0.0
                               WHEN den <> 0 THEN num / den END AS beta
                   FROM g2)
            SELECT N AS n_tokens, vocab,
                   round(beta, 6) AS beta,
                   round((sy - beta * sx) / c, 6) AS ln_k,
                   CASE WHEN den <> 0 AND deny <> 0
                        THEN round(num * num / (den * deny), 6) END AS r2
            FROM g3
        """,
        # trailing-window z, point excluded from its own frame.
        "rolling_zscore": """
            WITH o AS (
              SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
                     count(*) OVER w AS n,
                     CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(38,10)))
                          OVER w AS DOUBLE) AS s,
                     CAST(sum(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                          AS DECIMAL(38,10))) OVER w AS DOUBLE) AS ss
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
            z AS (SELECT user_id, event_id,
                         CASE WHEN n >= 1 THEN round(s / n, 6) END AS roll_mean,
                         CASE WHEN n >= 2 THEN round(sqrt(greatest(
                           (ss - s * s / n) / (n - 1), 0.0)), 6) END AS roll_std,
                         CASE WHEN n >= 2 AND sqrt(greatest(
                                (ss - s * s / n) / (n - 1), 0.0)) > 0
                              THEN round((v - s / n) / sqrt(greatest(
                                (ss - s * s / n) / (n - 1), 0.0)), 6)
                         END AS zscore
                  FROM o)
            SELECT user_id, event_id, roll_mean, roll_std, zscore,
                   coalesce(abs(zscore) > 3.0, FALSE) AS is_anomaly
            FROM z
        """,
        # per-key lag/delta/pct-change features.
        "lag_features": """
            WITH o AS (
              SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
                     lag(CAST(value AS DOUBLE), 1) OVER w AS l1,
                     lag(CAST(value AS DOUBLE), 7) OVER w AS l7
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, event_id,
                   l1 AS lag_1, round(v - l1, 6) AS delta_1,
                   CASE WHEN l1 IS NOT NULL AND l1 <> 0
                        THEN round((v - l1) / l1, 6) END AS pct_change_1,
                   l7 AS lag_7, round(v - l7, 6) AS delta_7,
                   CASE WHEN l7 IS NOT NULL AND l7 <> 0
                        THEN round((v - l7) / l7, 6) END AS pct_change_7
            FROM o
        """,
        # top-N + OTHER rollup from decimal-exact per-key totals.
        "topn_other": """
            WITH agg AS (
              SELECT CAST(l_partkey AS VARCHAR) AS k, count(*) AS n,
                     sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS td
              FROM lineitem GROUP BY 1),
            top AS (SELECT k, n, td, CAST(td AS DOUBLE) AS t FROM agg
                    ORDER BY CAST(td AS DOUBLE) DESC, k ASC LIMIT 10),
            tr AS (SELECT k AS l_partkey, CAST(n AS BIGINT) AS n_rows,
                          round(t, 4) AS total,
                          CAST(row_number() OVER (
                            ORDER BY t DESC, k ASC) AS INT) AS rank
                   FROM top),
            oth AS (SELECT 'OTHER' AS l_partkey,
                           CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
                           round(coalesce(CAST(sum(td) AS DOUBLE), 0.0), 4)
                             AS total,
                           CAST(11 AS INT) AS rank
                    FROM agg WHERE k NOT IN (SELECT k FROM top))
            SELECT * FROM tr
            UNION ALL SELECT * FROM oth WHERE n_rows > 0
        """,
        # Neyman allocation: decimal moments -> floored shares -> md5
        # rank cut, replayed exactly.
        "neyman_sample": """
            WITH st AS (
              SELECT event_type, count(*) AS N,
                     CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(38,10)))
                          AS DOUBLE) AS s,
                     CAST(sum(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                          AS DECIMAL(38,10))) AS DOUBLE) AS ss
              FROM events GROUP BY 1),
            wts AS (SELECT event_type, N,
                           N * sqrt(greatest(ss / N - (s / N) * (s / N), 0.0))
                             AS w
                    FROM st),
            tot AS (SELECT sum(w) AS tw, sum(N) AS tN FROM wts),
            alloc AS (SELECT event_type,
                             CAST(least(floor(CASE WHEN tw > 0
                                              THEN 2000 * w / tw
                                              ELSE 2000.0 * N / tN END), N)
                                  AS INT) AS alloc_n
                      FROM wts, tot),
            rk AS (SELECT e.event_type, e.event_id, e.value, a.alloc_n,
                          row_number() OVER (
                            PARTITION BY e.event_type
                            ORDER BY md5(e.event_type || ':'
                                         || CAST(e.event_id AS VARCHAR)) ASC,
                                     e.event_id ASC) AS r
                   FROM events e JOIN alloc a ON e.event_type = a.event_type)
            SELECT event_type, event_id, value, alloc_n
            FROM rk WHERE r <= alloc_n
        """,
        # rank-wise cross-group means (quantile normalization).
        "quantile_normalize": """
            WITH rk AS (
              SELECT source, doc_id, n_chars,
                     CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars ASC, doc_id ASC) AS INT) AS rank
              FROM documents),
            m AS (SELECT rank,
                         round(CAST(sum(CAST(n_chars AS DECIMAL(38,10)))
                               AS DOUBLE) / count(*), 6) AS normalized
                  FROM rk GROUP BY rank)
            SELECT r.source, r.doc_id, r.n_chars, r.rank, m.normalized
            FROM rk r JOIN m ON r.rank = m.rank
        """,
        # mean-shift changepoint from the same exact prefix sums.
        "changepoint": """
            WITH o AS (
              SELECT event_type AS k, value,
                     row_number() OVER w AS i,
                     count(*) OVER (PARTITION BY event_type) AS n,
                     CAST(sum(CAST(value AS DECIMAL(38,10)))
                          OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS s,
                     CAST(sum(CAST(value AS DECIMAL(38,10)))
                          OVER (PARTITION BY event_type) AS DOUBLE) AS st
              FROM events
              WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
            f AS (SELECT k, n, i, s, st,
                         s * s / i + (st - s) * (st - s) / (n - i) AS f
                  FROM o WHERE i < n),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY k ORDER BY f DESC, i ASC) AS rn FROM f)
            SELECT k AS event_type, CAST(n AS BIGINT) AS n,
                   CAST(i AS BIGINT) AS split_i,
                   round(s / i, 6) AS left_mean,
                   round((st - s) / (n - i), 6) AS right_mean,
                   round((st - s) / (n - i) - s / i, 6) AS delta
            FROM r WHERE rn = 1
        """,
        # greedy MMR unrolled: each round's pick joins the selected set.
        "mmr_rerank": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS xs
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, xs AS qv FROM v
                  WHERE vec_id < 5),
            sc AS (SELECT query_id, v.vec_id AS id,
                          list_cosine_similarity(qv, v.xs) AS rel, v.xs AS cv
                   FROM v, q WHERE v.vec_id <> query_id),
            cand AS (SELECT query_id, id, rel, cv FROM (
                       SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY rel DESC, id ASC) AS rk
                       FROM sc) WHERE rk <= 15),
            s1 AS (SELECT query_id, id, rel, cv, mmr FROM (
                     SELECT query_id, id, rel, cv, 0.7 * rel AS mmr,
                            row_number() OVER (PARTITION BY query_id
                              ORDER BY (0.7 * rel) DESC, id ASC) AS rn
                     FROM cand) WHERE rn = 1),
            sel2 AS (SELECT query_id, id, cv FROM s1),
            rem2 AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                         SELECT 1 FROM sel2 s
                         WHERE s.query_id = c.query_id AND s.id = c.id)),
            ms2 AS (SELECT r.query_id, r.id,
                             max(list_cosine_similarity(r.cv, s.cv)) AS ms
                      FROM rem2 r JOIN sel2 s ON s.query_id = r.query_id
                      GROUP BY 1, 2),
            s2 AS (SELECT query_id, id, rel, cv, mmr FROM (
                       SELECT r.query_id, r.id, r.rel, r.cv,
                              0.7 * r.rel - (1.0 - 0.7) * m.ms AS mmr,
                              row_number() OVER (
                                PARTITION BY r.query_id
                                ORDER BY (0.7 * r.rel - (1.0 - 0.7) * m.ms)
                                         DESC, r.id ASC) AS rn
                       FROM rem2 r JOIN ms2 m
                         ON m.query_id = r.query_id AND m.id = r.id)
                     WHERE rn = 1),
            sel3 AS (SELECT query_id, id, cv FROM s1 UNION ALL SELECT query_id, id, cv FROM s2),
            rem3 AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                         SELECT 1 FROM sel3 s
                         WHERE s.query_id = c.query_id AND s.id = c.id)),
            ms3 AS (SELECT r.query_id, r.id,
                             max(list_cosine_similarity(r.cv, s.cv)) AS ms
                      FROM rem3 r JOIN sel3 s ON s.query_id = r.query_id
                      GROUP BY 1, 2),
            s3 AS (SELECT query_id, id, rel, cv, mmr FROM (
                       SELECT r.query_id, r.id, r.rel, r.cv,
                              0.7 * r.rel - (1.0 - 0.7) * m.ms AS mmr,
                              row_number() OVER (
                                PARTITION BY r.query_id
                                ORDER BY (0.7 * r.rel - (1.0 - 0.7) * m.ms)
                                         DESC, r.id ASC) AS rn
                       FROM rem3 r JOIN ms3 m
                         ON m.query_id = r.query_id AND m.id = r.id)
                     WHERE rn = 1),
            sel4 AS (SELECT query_id, id, cv FROM s1 UNION ALL SELECT query_id, id, cv FROM s2 UNION ALL SELECT query_id, id, cv FROM s3),
            rem4 AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                         SELECT 1 FROM sel4 s
                         WHERE s.query_id = c.query_id AND s.id = c.id)),
            ms4 AS (SELECT r.query_id, r.id,
                             max(list_cosine_similarity(r.cv, s.cv)) AS ms
                      FROM rem4 r JOIN sel4 s ON s.query_id = r.query_id
                      GROUP BY 1, 2),
            s4 AS (SELECT query_id, id, rel, cv, mmr FROM (
                       SELECT r.query_id, r.id, r.rel, r.cv,
                              0.7 * r.rel - (1.0 - 0.7) * m.ms AS mmr,
                              row_number() OVER (
                                PARTITION BY r.query_id
                                ORDER BY (0.7 * r.rel - (1.0 - 0.7) * m.ms)
                                         DESC, r.id ASC) AS rn
                       FROM rem4 r JOIN ms4 m
                         ON m.query_id = r.query_id AND m.id = r.id)
                     WHERE rn = 1),
            sel5 AS (SELECT query_id, id, cv FROM s1 UNION ALL SELECT query_id, id, cv FROM s2 UNION ALL SELECT query_id, id, cv FROM s3 UNION ALL SELECT query_id, id, cv FROM s4),
            rem5 AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                         SELECT 1 FROM sel5 s
                         WHERE s.query_id = c.query_id AND s.id = c.id)),
            ms5 AS (SELECT r.query_id, r.id,
                             max(list_cosine_similarity(r.cv, s.cv)) AS ms
                      FROM rem5 r JOIN sel5 s ON s.query_id = r.query_id
                      GROUP BY 1, 2),
            s5 AS (SELECT query_id, id, rel, cv, mmr FROM (
                       SELECT r.query_id, r.id, r.rel, r.cv,
                              0.7 * r.rel - (1.0 - 0.7) * m.ms AS mmr,
                              row_number() OVER (
                                PARTITION BY r.query_id
                                ORDER BY (0.7 * r.rel - (1.0 - 0.7) * m.ms)
                                         DESC, r.id ASC) AS rn
                       FROM rem5 r JOIN ms5 m
                         ON m.query_id = r.query_id AND m.id = r.id)
                     WHERE rn = 1)
            SELECT query_id, id AS neighbor_id, CAST(rank AS INT) AS rank,
                   round(mmr, 6) AS mmr_score
            FROM (SELECT query_id, id, 1 AS rank, mmr FROM s1 UNION ALL SELECT query_id, id, 2 AS rank, mmr FROM s2 UNION ALL SELECT query_id, id, 3 AS rank, mmr FROM s3 UNION ALL SELECT query_id, id, 4 AS rank, mmr FROM s4 UNION ALL SELECT query_id, id, 5 AS rank, mmr FROM s5)
""",
        # deterministic negative sampling, NOT EXISTS against real edges.
        "negative_edges": """
            WITH e AS (SELECT DISTINCT l_orderkey % 20000 AS u,
                              (l_partkey * 3) % 20000 AS v
                       FROM lineitem),
            s AS (SELECT DISTINCT u FROM e),
            c AS (SELECT u, i,
                         ('0x' || substr(md5('neg' || ':'
                            || CAST(u AS VARCHAR) || ':'
                            || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 20000 AS d
                  FROM s, unnest(generate_series(0, 8)) AS t(i)),
            f AS (SELECT * FROM c WHERE u <> d AND NOT EXISTS (
                    SELECT 1 FROM e WHERE e.u = c.u AND e.v = c.d)),
            r AS (SELECT u, d, row_number() OVER (
                    PARTITION BY u ORDER BY i ASC) AS rn FROM f)
            SELECT u AS src, d AS dst, CAST(rn AS INT) AS neg_rank
            FROM r WHERE rn <= 3
""",
        # PSI drift, identical bin and smoothing arithmetic.
        "psi_drift": """
            WITH scoped AS (
              SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
                          THEN 'base' ELSE 'cur' END AS per,
                     CAST(value AS DOUBLE) AS v
              FROM events),
            st AS (SELECT min(v) AS lo, max(v) AS hi FROM scoped),
            b1 AS (SELECT CASE WHEN hi = lo THEN 0
                               ELSE CAST(least(floor((v - lo)
                                    / ((hi - lo) / 10)), 9) AS INT) END AS bin,
                          lo, hi, per
                   FROM scoped, st),
            b2 AS (SELECT bin,
                          round(lo + bin * ((hi - lo) / 10), 6) AS lo_edge,
                          CASE WHEN per = 'base' THEN 1 ELSE 0 END AS nb,
                          CASE WHEN per = 'cur' THEN 1 ELSE 0 END AS nc
                   FROM b1),
            c AS (SELECT bin, lo_edge, sum(nb) AS n_base, sum(nc) AS n_cur
                  FROM b2 GROUP BY 1, 2),
            t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM c)
            SELECT bin, lo_edge,
                   CAST(n_base AS BIGINT) AS n_base,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   round(CAST(n_base AS DOUBLE) / tb, 6) AS frac_base,
                   round(CAST(n_cur AS DOUBLE) / tc, 6) AS frac_cur,
                   round((CAST(n_cur AS DOUBLE) / tc + 1e-6
                          - (CAST(n_base AS DOUBLE) / tb + 1e-6))
                         * ln((CAST(n_cur AS DOUBLE) / tc + 1e-6)
                              / (CAST(n_base AS DOUBLE) / tb + 1e-6)), 6)
                     AS psi_term
            FROM c, t
        """,
        # RFM quintiles against pooled quantile_cont edges.
        "rfm": """
            WITH mx AS (SELECT max(ts) AS m FROM events),
            u AS (SELECT user_id,
                         CAST(floor(min(epoch_us(m) - epoch_us(ts))
                              / 1000000) AS BIGINT) AS recency_s,
                         CAST(count(*) AS BIGINT) AS freq,
                         CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
                           AS monetary
                  FROM events, mx GROUP BY user_id),
            e AS (SELECT quantile_cont(recency_s, 0.2) AS r0,
                         quantile_cont(recency_s, 0.4) AS r1,
                         quantile_cont(recency_s, 0.6) AS r2,
                         quantile_cont(recency_s, 0.8) AS r3,
                         quantile_cont(freq, 0.2) AS f0,
                         quantile_cont(freq, 0.4) AS f1,
                         quantile_cont(freq, 0.6) AS f2,
                         quantile_cont(freq, 0.8) AS f3,
                         quantile_cont(monetary, 0.2) AS m0,
                         quantile_cont(monetary, 0.4) AS m1,
                         quantile_cont(monetary, 0.6) AS m2,
                         quantile_cont(monetary, 0.8) AS m3
                  FROM u),
            s AS (SELECT user_id, recency_s, freq, monetary,
                         6 - (1 + CAST(recency_s > r0 AS INT)
                                + CAST(recency_s > r1 AS INT)
                                + CAST(recency_s > r2 AS INT)
                                + CAST(recency_s > r3 AS INT)) AS r_score,
                         1 + CAST(freq > f0 AS INT) + CAST(freq > f1 AS INT)
                           + CAST(freq > f2 AS INT) + CAST(freq > f3 AS INT)
                             AS f_score,
                         1 + CAST(monetary > m0 AS INT)
                           + CAST(monetary > m1 AS INT)
                           + CAST(monetary > m2 AS INT)
                           + CAST(monetary > m3 AS INT) AS m_score
                  FROM u, e)
            SELECT user_id, recency_s, freq, round(monetary, 4) AS monetary,
                   CAST(r_score AS INT) AS r_score,
                   CAST(f_score AS INT) AS f_score,
                   CAST(m_score AS INT) AS m_score,
                   CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                     || CAST(m_score AS VARCHAR) AS segment
            FROM s
        """,
        # JSON column extraction parity.
        "json_props": """
            WITH x AS (SELECT event_type,
                              CAST(json_extract_string(props, '$.k') AS INT)
                                AS k
                       FROM events)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_null,
                   CAST(sum(k) AS BIGINT) AS k_sum,
                   min(k) AS k_min, max(k) AS k_max,
                   round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS k_avg
            FROM x GROUP BY event_type
        """,
        # hopping windows: every event contributes to the two slides
        # covering it; only watermark-closed windows emit.
        "stream_hopping_counts": """
            WITH s AS (
              SELECT event_type, ts,
                     unnest([
                       to_timestamp((epoch_us(ts) // 1800000000) * 1800
                                    - 1800),
                       to_timestamp((epoch_us(ts) // 1800000000) * 1800)
                     ]) AS ws
              FROM events),
            m AS (SELECT max(ts) AS mx FROM events),
            agg AS (SELECT ws, event_type, count(*) AS n FROM s GROUP BY 1, 2)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, n
            FROM agg, m
            WHERE epoch_us(ws) + 3600000000 + 7200000000 <= epoch_us(mx)
        """,
        # streaming upsert folds to last-per-key (ts, event_id).
        "stream_upsert": """
            WITH r AS (SELECT user_id, ts, event_id, event_type, value,
                              row_number() OVER (
                                PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
                       FROM events)
            SELECT user_id, ts, event_id, event_type, value
            FROM r WHERE rn = 1
        """,
        # Benford: printf mirrors format_number's fixed-10-decimal
        # rendering; stripping 0/./, leaves the first significant digit.
        "benford": """
            WITH d0 AS (
              SELECT floor(round(abs(CAST(o_totalprice AS DOUBLE))
                           / pow(10.0, floor(log10(
                               abs(CAST(o_totalprice AS DOUBLE))))), 12)) AS d
              FROM orders WHERE abs(CAST(o_totalprice AS DOUBLE)) > 0),
            d AS (SELECT CAST(CASE WHEN d >= 10 THEN 1 ELSE d END AS INT)
                         AS digit FROM d0),
            c AS (SELECT digit, count(*) AS observed_n FROM d
                  WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
            t AS (SELECT sum(observed_n) AS tot FROM c)
            SELECT digit, CAST(observed_n AS BIGINT) AS observed_n,
                   round(CAST(observed_n AS DOUBLE) / tot, 6) AS observed_frac,
                   round(log10(1.0 + 1.0 / digit), 6) AS expected_frac,
                   round((observed_n - log10(1.0 + 1.0 / digit) * tot)
                         * (observed_n - log10(1.0 + 1.0 / digit) * tot)
                         / (log10(1.0 + 1.0 / digit) * tot), 6) AS chi2_term
            FROM c, t
        """,
        # k-anonymity group audit.
        "k_anonymity": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(floor(value / 50) AS BIGINT) AS value_band,
                   CAST(count(*) AS BIGINT) AS group_n,
                   (count(*) < 5) AS is_risky
            FROM events GROUP BY 1, 2, 3
        """,
        # every prefix of the part-type path, decimal-exact totals.
        "prefix_rollup": """
            WITH parts AS (SELECT string_split(p_type, ' ') AS w,
                                  p_retailprice FROM part),
            px AS (SELECT array_to_string(w[1:i], ' ') AS prefix,
                          CAST(i AS INT) AS depth,
                          CAST(p_retailprice AS DECIMAL(38,10)) AS v
                   FROM parts, unnest(generate_series(1, len(w))) AS t(i))
            SELECT prefix, depth, CAST(count(*) AS BIGINT) AS n,
                   round(CAST(sum(v) AS DOUBLE), 4) AS total
            FROM px GROUP BY 1, 2
        """,
        # Zipf OLS from 9-digit-rounded decimal-summed moments.
        "zipf_fit": """
            WITH c AS (
              SELECT t, count(*) AS freq FROM (
                SELECT unnest(list_filter(string_split_regex(lower(text),
                       '\\s+'), x -> x <> '')) AS t
                FROM documents)
              GROUP BY t ORDER BY freq DESC, t ASC LIMIT 200),
            rk AS (SELECT CAST(row_number() OVER (
                     ORDER BY freq DESC, t ASC) AS DOUBLE) AS r,
                          CAST(freq AS DOUBLE) AS f
                   FROM c),
            g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         CAST(sum(CAST(round(ln(r), 9) AS DECIMAL(38,12)))
                              AS DOUBLE) AS sx,
                         CAST(sum(CAST(round(ln(f), 9) AS DECIMAL(38,12)))
                              AS DOUBLE) AS sy,
                         CAST(sum(CAST(round(ln(r) * ln(r), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
                         CAST(sum(CAST(round(ln(r) * ln(f), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sxy
                  FROM rk)
            SELECT CAST(n AS BIGINT) AS n_terms,
                   round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
                   round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                         / n, 6) AS intercept
            FROM g
        """,
        # ER pipeline: FS matches -> recursive min-label components.
        "er_entities": """
            WITH RECURSIVE r AS (
              SELECT c_custkey AS id, c_nationkey, c_mktsegment,
                     floor(c_acctbal / 1000) AS pfx,
                     row_number() OVER (ORDER BY c_name, c_custkey) AS rk
              FROM customer),
            p AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     a.c_nationkey AS na, b.c_nationkey AS nb,
                     a.c_mktsegment AS sa, b.c_mktsegment AS sb,
                     a.pfx AS pa, b.pfx AS pb
              FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3),
            s AS (
              SELECT id_a, id_b,
                     round(
                       CASE WHEN na IS NULL OR nb IS NULL THEN 0
                            WHEN na = nb
                            THEN log2(0.9 / 0.04) ELSE log2(0.1 / 0.96) END
                     + CASE WHEN sa IS NULL OR sb IS NULL THEN 0
                            WHEN sa = sb
                            THEN log2(0.9 / 0.2) ELSE log2(0.1 / 0.8) END
                     + CASE WHEN pa IS NULL OR pb IS NULL THEN 0
                            WHEN pa = pb
                            THEN log2(0.95 / 0.08) ELSE log2(0.05 / 0.92) END,
                     6) AS match_score
              FROM p),
            m AS (SELECT id_a, id_b FROM s WHERE match_score > 6.0),
            edges AS (SELECT id_a AS u, id_b AS v FROM m
                      UNION ALL SELECT id_b, id_a FROM m),
            reach(n, lab) AS (
              SELECT c_custkey, c_custkey FROM customer
              UNION
              SELECT rr.n, e.v FROM reach rr JOIN edges e ON e.u = rr.lab)
            SELECT n AS c_custkey, min(lab) AS entity_id
            FROM reach GROUP BY n
        """,
        # coordinated-sample join size estimate.
        "join_size_estimate": """
            WITH lc AS (
              SELECT o_custkey AS k, count(*) AS c FROM orders
              WHERE ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                    % 16 = 0
              GROUP BY 1),
            rc AS (
              SELECT c_custkey AS k, count(*) AS c FROM customer
              WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                    % 16 = 0
              GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS sampled_keys,
                   CAST(coalesce(sum(lc.c * rc.c), 0) * 16 AS BIGINT)
                     AS est_join_rows
            FROM lc JOIN rc ON lc.k = rc.k
        """,
        # FK orphan + coverage audit.
        "referential_check": """
            WITH ck AS (SELECT user_id AS k, count(*) AS n FROM events
                        GROUP BY 1),
            pk AS (SELECT DISTINCT c_custkey AS k FROM customer),
            o AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_orphan_rows,
                         CAST(count(*) AS BIGINT) AS n_orphan_keys
                  FROM ck WHERE k NOT IN (SELECT k FROM pk)),
            c AS (SELECT CAST(sum(n) AS BIGINT) AS n_child FROM ck),
            ps AS (SELECT CAST(count(*) AS BIGINT) AS n_parents FROM pk),
            rs AS (SELECT CAST(count(*) AS BIGINT) AS n_referenced_parents
                   FROM pk WHERE k IN (SELECT k FROM ck))
            SELECT n_child, n_orphan_rows, n_orphan_keys,
                   round(CAST(n_orphan_rows AS DOUBLE) / n_child, 6)
                     AS orphan_frac,
                   n_parents, n_referenced_parents
            FROM c, o, ps, rs
        """,
        # Welch z-report from decimal-exact moments.
        "ab_delta": """
            WITH units AS (
              SELECT user_id,
                     CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS y,
                     CAST(user_id % 2 AS INT) AS variant
              FROM events GROUP BY user_id),
            sa AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                          CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS s,
                          CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE)
                            AS ss
                   FROM units WHERE variant = 0),
            sb AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                          CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS s,
                          CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE)
                            AS ss
                   FROM units WHERE variant = 1)
            SELECT CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
                   round(sa.s / sa.n, 6) AS mean_a,
                   round(sb.s / sb.n, 6) AS mean_b,
                   round(sb.s / sb.n - sa.s / sa.n, 6) AS diff,
                   round(sqrt((sa.ss - sa.s * sa.s / sa.n) / (sa.n - 1) / sa.n
                            + (sb.ss - sb.s * sb.s / sb.n) / (sb.n - 1) / sb.n),
                         6) AS se,
                   round((sb.s / sb.n - sa.s / sa.n)
                         / sqrt((sa.ss - sa.s * sa.s / sa.n) / (sa.n - 1) / sa.n
                              + (sb.ss - sb.s * sb.s / sb.n) / (sb.n - 1)
                                / sb.n), 6) AS z
            FROM sa, sb
        """,
        # 2-round unrolled Fellegi-Sunter EM over the same pair table.
        "fs_em": f"""
            WITH r AS (
              SELECT c_custkey AS id, c_nationkey, c_mktsegment,
                     floor(c_acctbal / 1000) AS pfx,
                     row_number() OVER (ORDER BY c_name, c_custkey) AS rk
              FROM customer),
            p AS (
              SELECT a.c_nationkey AS na, b.c_nationkey AS nb,
                     a.c_mktsegment AS sa, b.c_mktsegment AS sb,
                     a.pfx AS pa, b.pfx AS pb
              FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3),
            fspairs AS (
              SELECT (na IS NOT NULL AND na IS NOT DISTINCT FROM nb)
                       AS agree_nation,
                     (sa IS NOT NULL AND sa IS NOT DISTINCT FROM sb)
                       AS agree_segment,
                     (pa IS NOT NULL AND pa IS NOT DISTINCT FROM pb)
                       AS agree_balband
              FROM p),
            fst0 AS (SELECT {fs_em_totals} FROM fspairs),
            {fs_em_rounds}
            {fs_em_final}
        """,
        # Apriori-pruned directed pair rules.
        "association_rules": """
            WITH items AS (SELECT DISTINCT l_orderkey AS b,
                                  l_partkey % 50 AS i
                           FROM lineitem),
            nb AS (SELECT count(DISTINCT b) AS N FROM items),
            cnt AS (SELECT i, count(*) AS c FROM items GROUP BY i),
            freq AS (SELECT i, c FROM cnt WHERE c >= 100),
            pr AS (SELECT it.b, it.i FROM items it JOIN freq f ON it.i = f.i),
            pairs AS (SELECT a.i AS item_a, b2.i AS item_b, count(*) AS pair_n
                      FROM pr a JOIN pr b2 ON a.b = b2.b AND a.i <> b2.i
                      GROUP BY 1, 2 HAVING count(*) >= 100)
            SELECT item_a, item_b, CAST(pair_n AS BIGINT) AS support_count,
                   round(CAST(pair_n AS DOUBLE) / N, 6) AS support,
                   round(CAST(pair_n AS DOUBLE) / ca, 6) AS confidence,
                   round((CAST(pair_n AS DOUBLE) / ca)
                         / (CAST(cb AS DOUBLE) / N), 6) AS lift
            FROM pairs
            JOIN (SELECT i AS item_a, c AS ca FROM freq) USING (item_a)
            JOIN (SELECT i AS item_b, c AS cb FROM freq) USING (item_b), nb
            WHERE round(CAST(pair_n AS DOUBLE) / ca, 6) >= 0.05
        """,
        # CUPED adjusted means from decimal-exact pooled moments.
        "cuped": """
            WITH units AS (
              SELECT user_id,
                     CAST(sum(CAST(CASE WHEN ts < TIMESTAMP '2024-01-16'
                                        THEN value ELSE 0.0 END
                                   AS DECIMAL(38,10))) AS DOUBLE) AS x,
                     CAST(sum(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                        THEN value ELSE 0.0 END
                                   AS DECIMAL(38,10))) AS DOUBLE) AS y,
                     CAST(user_id % 2 AS INT) AS variant
              FROM events GROUP BY user_id),
            g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
                         CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
                         CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE)
                           AS sxx,
                         CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE)
                           AS sxy
                  FROM units),
            p AS (SELECT variant, count(*) AS nu,
                         CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS vy,
                         CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS vx
                  FROM units GROUP BY variant)
            SELECT variant, CAST(nu AS BIGINT) AS n_units,
                   round(vy / nu, 6) AS mean_metric,
                   round(vy / nu
                         - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                           * (vx / nu - sx / n), 6) AS mean_adjusted
            FROM p, g
        """,
        # streaming windowed top-k: the oracle replays the tumbling
        # count + rank in batch, keeping only windows the 2 h watermark
        # closed (window_end <= max_ts - 2 h, the session-oracle rule).
        "stream_windowed_topk": """
            WITH c AS (
              SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n
              FROM events GROUP BY 1, 2),
            m AS (SELECT max(ts) AS mx FROM events),
            r AS (SELECT ws, event_type, n,
                         row_number() OVER (PARTITION BY ws
                                            ORDER BY n DESC, event_type ASC)
                           AS rank
                  FROM c, m
                  WHERE epoch_us(ws) + 3600000000 + 7200000000 <= epoch_us(mx))
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, n, CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 3
        """,
        # directed containment, brute-force verified at oracle scale.
        "containment_pairs": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words)
            SELECT id_a, id_b, containment FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                           / len(a.s), 6) AS containment
              FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
            WHERE containment >= 0.7
        """,
        # running-total bin packing per partition.
        "compaction_plan": """
            WITH f AS (
              SELECT strftime(ts, '%Y-%m-%d') AS part_date, hour(ts) AS file_id,
                     CAST(count(*) * 128 AS BIGINT) AS size_bytes
              FROM events GROUP BY 1, 2),
            p AS (
              SELECT part_date, file_id, size_bytes,
                     CAST(floor(coalesce(sum(size_bytes) OVER (
                       PARTITION BY part_date
                       ORDER BY size_bytes DESC, file_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / 100000) AS INT) AS bin
              FROM f)
            SELECT part_date, file_id, size_bytes, bin,
                   CAST(sum(size_bytes) OVER (PARTITION BY part_date, bin)
                        AS BIGINT) AS bin_bytes
            FROM p
        """,
        "table_profile": profile_union,
        # two deterministic Lloyd rounds + final assignment.
        "kmeans_train": f"""
            WITH pts AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings),
            h AS (SELECT id, v,
                         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT
                           AS hh
                  FROM pts),
            i0 AS (SELECT id, v, hh FROM h ORDER BY hh ASC, id ASC LIMIT 4),
            c0 AS (SELECT CAST((SELECT count(*) FROM i0 j
                                WHERE j.hh < i.hh
                                   OR (j.hh = i.hh AND j.id < i.id)) AS INT) AS cl,
                          i.v AS v
                   FROM i0 i),
            {kmeans_rounds},
            af AS (SELECT p.id, c.cl, list_distance(p.v, c.v) AS d
                   FROM pts p CROSS JOIN c2 c),
            mf AS (SELECT id, min(d) AS md FROM af GROUP BY id)
            SELECT a.id AS vec_id, CAST(min(a.cl) AS INT) AS cluster,
                   round(min(m.md), 6) AS dist
            FROM af a JOIN mf m ON a.id = m.id AND a.d = m.md
            GROUP BY a.id
        """,
        # inverted-index TF-IDF cosine pairs, stop terms pruned.
        "tfidf_cosine_pairs": """
            WITH tok AS (
              SELECT doc_id AS id,
                     unnest(list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), x -> x <> '')) AS t
              FROM documents),
            tf AS (SELECT id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
            nd AS (SELECT count(DISTINCT doc_id) AS N FROM documents),
            dfq AS (SELECT t, count(*) AS df_ FROM tf GROUP BY t),
            kept AS (SELECT t, df_, N FROM dfq, nd
                     WHERE df_ >= 2 AND df_ <= 0.3 * N),
            w AS (SELECT id, tf.t, tf.tf * ln(1 + CAST(N AS DOUBLE) / df_) AS w
                  FROM tf JOIN kept ON tf.t = kept.t),
            norms AS (SELECT id, sqrt(sum(w * w)) AS n FROM w GROUP BY id),
            wn AS (SELECT w.t, w.id, w.w / n.n AS wn
                   FROM w JOIN norms n USING (id)),
            p AS (SELECT a.id AS id_a, b.id AS id_b,
                         round(sum(a.wn * b.wn), 6) AS cos_sim
                  FROM wn a JOIN wn b ON a.t = b.t AND a.id < b.id
                  GROUP BY 1, 2)
            SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.25
        """,
        # 2-D skyline: the oracle uses the textbook single cummin
        # window; the Spark plan buckets it — same frontier.
        "pareto_frontier": """
            WITH b AS (
              SELECT l_orderkey * 100 + l_linenumber AS lid,
                     CAST(l_extendedprice AS DOUBLE) AS x,
                     CAST(l_quantity AS DOUBLE) AS y
              FROM lineitem),
            w AS (SELECT *, min(y) OVER (
                     ORDER BY x, y, lid
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
                  FROM b)
            SELECT lid, x AS l_extendedprice, y AS l_quantity
            FROM w WHERE pm IS NULL OR y < pm
        """,
        # 3 unrolled k-core peel rounds over the co-occurrence graph.
        "kcore": f"""
            WITH e0 AS (
              SELECT DISTINCT
                     least(l_orderkey % 20000, (l_partkey * 3) % 20000) AS u,
                     greatest(l_orderkey % 20000, (l_partkey * 3) % 20000) AS v
              FROM lineitem
              WHERE l_orderkey % 20000 <> (l_partkey * 3) % 20000),
            {kcore_rounds}
            SELECT node, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
            GROUP BY node
        """,
        # Z-order bucket stats from the arithmetic Morton interleave.
        "zorder_stats": f"""
            WITH q AS (
              SELECT least(CAST(floor(value * 100) AS BIGINT), 65535) AS zx,
                     user_id % 65536 AS zy
              FROM events),
            z AS (SELECT zx, zy, ({morton}) AS zval FROM q)
            SELECT zval // 16777216 AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(zx) AS x_min, max(zx) AS x_max,
                   min(zy) AS y_min, max(zy) AS y_max
            FROM z GROUP BY 1
        """,
        # point-in-time SCD2 join: the oracle materializes the version
        # intervals and applies the literal interval predicate; the
        # Spark plan forward-fills instead — same answer.
        "scd2_lookup": """
            WITH src AS (
              SELECT user_id, ts,
                     CASE WHEN value < 20 THEN 'low'
                          WHEN value < 55 THEN 'mid'
                          ELSE 'high' END AS tier
              FROM events),
            chg AS (
              SELECT user_id, tier, ts,
                     lag(ts) OVER w IS NULL
                       OR tier IS DISTINCT FROM lag(tier) OVER w AS keep
              FROM src
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, tier ASC)),
            ver AS (
              SELECT user_id, tier, ts AS vf, lead(ts) OVER w2 AS vt
              FROM (SELECT * FROM chg WHERE keep)
              WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, tier ASC)),
            f AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click')
            SELECT f.event_id, f.user_id, f.ts, v.tier
            FROM f JOIN ver v ON f.user_id = v.user_id
              AND f.ts >= v.vf AND (v.vt IS NULL OR f.ts < v.vt)
        """,
        # KMV set algebra: union sketch + shared-hash Jaccard, the
        # kmv_distinct hash replayed bit-for-bit.
        "kmv_set_ops": """
            WITH ev AS (
              SELECT event_type, user_id,
                     CASE WHEN ts < TIMESTAMP '2024-01-16'
                          THEN 'h1' ELSE 'h2' END AS half
              FROM events),
            flags AS (
              SELECT event_type,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u,
                     max(CASE WHEN half = 'h1' THEN 1 ELSE 0 END) AS a,
                     max(CASE WHEN half = 'h2' THEN 1 ELSE 0 END) AS b
              FROM ev GROUP BY 1, 2),
            rk AS (SELECT *, row_number() OVER (
                     PARTITION BY event_type ORDER BY u ASC) AS r
                   FROM flags),
            top AS (SELECT * FROM rk WHERE r <= 64)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(sum(a * b) AS BIGINT) AS shared_kept,
                   round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                              ELSE 63.0 / greatest(max(u), 1e-12) END, 4)
                     AS est_union,
                   round(CAST(sum(a * b) AS DOUBLE) / count(*), 4) AS jaccard_est,
                   round((CAST(sum(a * b) AS DOUBLE) / count(*))
                         * CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                                ELSE 63.0 / greatest(max(u), 1e-12) END, 4)
                     AS est_intersection
            FROM top GROUP BY event_type
        """,
        # Fellegi-Sunter over sorted-neighborhood candidate pairs.
        "fellegi_sunter": """
            WITH r AS (
              SELECT c_custkey AS id, c_nationkey, c_mktsegment,
                     floor(c_acctbal / 1000) AS pfx,
                     row_number() OVER (ORDER BY c_name, c_custkey) AS rk
              FROM customer),
            p AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     a.c_nationkey AS na, b.c_nationkey AS nb,
                     a.c_mktsegment AS sa, b.c_mktsegment AS sb,
                     a.pfx AS pa, b.pfx AS pb
              FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3),
            s AS (
              SELECT id_a, id_b,
                     (na IS NOT NULL AND na IS NOT DISTINCT FROM nb)
                       AS agree_nation,
                     (sa IS NOT NULL AND sa IS NOT DISTINCT FROM sb)
                       AS agree_segment,
                     (pa IS NOT NULL AND pa IS NOT DISTINCT FROM pb)
                       AS agree_balband,
                     round(
                       CASE WHEN na IS NULL OR nb IS NULL THEN 0
                            WHEN na = nb
                            THEN log2(0.9 / 0.04) ELSE log2(0.1 / 0.96) END
                     + CASE WHEN sa IS NULL OR sb IS NULL THEN 0
                            WHEN sa = sb
                            THEN log2(0.9 / 0.2) ELSE log2(0.1 / 0.8) END
                     + CASE WHEN pa IS NULL OR pb IS NULL THEN 0
                            WHEN pa = pb
                            THEN log2(0.95 / 0.08) ELSE log2(0.05 / 0.92) END,
                     6) AS match_score
              FROM p)
            SELECT id_a, id_b, agree_nation, agree_segment, agree_balband,
                   match_score, (match_score > 2.0) AS is_match
            FROM s
        """,
        # RRF hybrid fusion of the shared bm25 pipeline and the shared
        # cosine expression.
        "rrf_fusion": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), x -> x <> '') AS w
              FROM documents),
            stats AS (SELECT count(*) AS N, avg(len(w)) AS avgdl FROM w),
            tf AS (
              SELECT doc_id, t, count(*) AS tf, max(len(w)) AS dl
              FROM w, unnest(w.w) AS u(t)
              WHERE t IN ('spark', 'merge', 'stream')
              GROUP BY doc_id, t),
            dfq AS (SELECT t, count(*) AS df_ FROM tf GROUP BY t),
            bmf AS (
              SELECT doc_id,
                     round(sum(
                       ln(1 + (N - df_ + 0.5) / (df_ + 0.5))
                       * tf * 2.2
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                     ), 4) AS s
              FROM tf JOIN dfq USING (t) CROSS JOIN stats
              GROUP BY doc_id),
            bm AS (SELECT doc_id AS id, s FROM bmf
                   ORDER BY s DESC, id ASC LIMIT 100),
            q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id = 0),
            cosx AS (
              SELECT e.vec_id AS id,
                     list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[]))
                       AS s
              FROM embeddings e, q),
            cs AS (SELECT id, s FROM cosx ORDER BY s DESC, id ASC LIMIT 100),
            u AS (SELECT 'bm25' AS src, id, s FROM bm
                  UNION ALL SELECT 'cosine', id, s FROM cs),
            rk AS (SELECT src, id, row_number() OVER (
                     PARTITION BY src ORDER BY s DESC, id ASC) AS r
                   FROM u),
            f AS (SELECT id, round(sum(1.0 / (60 + r)), 6) AS rrf_score,
                         CAST(count(*) AS BIGINT) AS n_lists
                  FROM rk GROUP BY id)
            SELECT id AS doc_id, rrf_score, n_lists
            FROM f ORDER BY rrf_score DESC, doc_id ASC LIMIT 50
        """,
        # Count-Min sketch, md5-derived and therefore engine-portable:
        # the ESTIMATE itself is checked, not just an error bound.
        "cms_counts": """
            WITH b AS (
              SELECT CAST(user_id AS VARCHAR) AS key, v.d,
                     ('0x' || substr(md5(v.d || ':' || CAST(user_id AS VARCHAR)),
                      1, 8))::BIGINT % 64 AS bkt
              FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) v(d)),
            counters AS (SELECT d, bkt, count(*) AS c FROM b GROUP BY 1, 2),
            keys AS (SELECT CAST(user_id AS VARCHAR) AS key,
                            count(*) AS exact_count
                     FROM events GROUP BY 1),
            probes AS (
              SELECT k.key, k.exact_count, v.d,
                     ('0x' || substr(md5(v.d || ':' || k.key), 1, 8))::BIGINT % 64
                       AS bkt
              FROM keys k CROSS JOIN (VALUES (0),(1),(2),(3)) v(d)),
            est AS (SELECT p.key, p.exact_count, min(c.c) AS est_count
                    FROM probes p JOIN counters c ON c.d = p.d AND c.bkt = p.bkt
                    GROUP BY 1, 2)
            SELECT key, CAST(est_count AS BIGINT) AS est_count,
                   CAST(exact_count AS BIGINT) AS exact_count,
                   (est_count >= exact_count) AS cms_ok
            FROM est
        """,
        # median/MAD modified z-score; quantile_cont == percentile
        # parity is pinned by grouped_percentiles.
        "mad_outliers": """
            WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
                         FROM events GROUP BY 1),
            dev AS (SELECT e.event_id, e.event_type, e.value, m.m
                    FROM events e JOIN med m USING (event_type)),
            mad AS (SELECT event_type, quantile_cont(abs(value - m), 0.5) AS md
                    FROM dev GROUP BY 1)
            SELECT d.event_id, d.event_type, d.value,
                   CASE WHEN md > 0
                        THEN round(0.6745 * (d.value - d.m) / md, 6) END AS robust_z,
                   coalesce(abs(CASE WHEN md > 0
                        THEN round(0.6745 * (d.value - d.m) / md, 6) END) > 3.5,
                        FALSE) AS is_outlier
            FROM dev d JOIN mad USING (event_type)
        """,
        # CDC replay: last op per key wins, deletes tombstone the key.
        "cdc_replay": """
            WITH log AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                     event_type, value
              FROM events),
            r AS (SELECT *, row_number() OVER (
                     PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                  FROM log)
            SELECT user_id, event_type, value FROM r WHERE rn = 1 AND op <> 'D'
        """,
        # hourly grid + forward fill on the exact microsecond time base.
        "gap_fill": """
            WITH obs AS (
              SELECT event_type AS key,
                     (epoch_us(ts) // 3600000000) * 3600 AS g,
                     epoch_us(ts) AS t, value AS v, 1 AS is_obs
              FROM events),
            spans AS (SELECT key, min(g) AS lo, max(g) AS hi FROM obs GROUP BY key),
            grid AS (SELECT key, unnest(range(lo, hi + 1, 3600)) AS g FROM spans),
            gr AS (SELECT key, g, (g + 3600) * 1000000 - 1 AS t,
                          CAST(NULL AS DOUBLE) AS v, 0 AS is_obs FROM grid),
            u AS (SELECT key, g, t, v, is_obs FROM obs
                  UNION ALL SELECT key, g, t, v, is_obs FROM gr),
            f AS (SELECT key, g, v, is_obs,
                    last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                      OVER (PARTITION BY key ORDER BY t, is_obs DESC, v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv,
                    last_value(CASE WHEN is_obs = 1 THEN g END IGNORE NULLS)
                      OVER (PARTITION BY key ORDER BY t, is_obs DESC, v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fg
                  FROM u)
            SELECT key AS event_type, make_timestamp(g * 1000000) AS grid_ts,
                   fv AS value_filled, (fg = g) AS is_observed
            FROM f WHERE is_obs = 0
        """,
        # bloom prefilter never changes the answer: oracle is the plain
        # selective join.
        "bloom_join": """
            SELECT o_orderkey, o_custkey, c_name, o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE n_name = 'NATION_10'
        """,
        # sorted-neighborhood: pairs within rank distance 5 on the
        # (p_name, p_partkey) total order.
        "sorted_neighborhood": """
            WITH r AS (SELECT p_partkey AS id, CAST(p_name AS VARCHAR) AS key,
                              row_number() OVER (ORDER BY p_name, p_partkey) AS rk
                       FROM part)
            SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a, b.key AS key_b,
                   CAST(b.rk - a.rk AS BIGINT) AS rank_distance
            FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 5
        """,
        # fertility: shared token regex / whitespace split expressions.
        "tokenizer_fertility": """
            WITH per AS (
              SELECT source,
                     len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                       AS w,
                     len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                       AS t,
                     length(text) AS c
              FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS n_words,
                   CAST(sum(t) AS BIGINT) AS n_tokens,
                   round(CAST(sum(t) AS DOUBLE) / sum(w), 6) AS fertility,
                   round(sum(t) * 100.0 / sum(c), 6) AS tokens_per_100_chars
            FROM per GROUP BY source
        """,
        # DSIR hashed-unigram log-ratio, decimal-exact per-doc sum.
        "dsir_weights": """
            WITH toks AS (
              SELECT doc_id, (source = 'src7') AS t,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE length(text) > 0),
            tb AS (SELECT doc_id, t,
                          ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
                   FROM toks),
            counts AS (SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
                              count(*) AS cr
                       FROM tb GROUP BY b),
            totals AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM counts),
            ratio AS (SELECT b,
                        CAST(round(ln((ct + 1) / (tt + 1024))
                                   - ln((cr + 1) / (tr + 1024)), 9)
                             AS DECIMAL(20,9)) AS lr
                      FROM counts, totals)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(round(sum(lr), 6) AS DOUBLE) AS log_weight
            FROM tb JOIN ratio USING (b)
            GROUP BY doc_id
        """,
        # Recursive ancestor closure over the part hierarchy; on a tree
        # the min is the unique path length. Matches the pointer-doubling
        # Spark plan pair-for-pair.
        "graph_closure": """
            WITH RECURSIVE e AS (
              SELECT p_partkey AS src, p_partkey // 10 AS dst
              FROM part WHERE p_partkey >= 1),
            anc AS (
              SELECT src, dst, 1 AS dist FROM e
              UNION
              SELECT a.src, e.dst, a.dist + 1
              FROM anc a JOIN e ON a.dst = e.src)
            SELECT src AS node, dst AS ancestor,
                   CAST(min(dist) AS BIGINT) AS dist
            FROM anc GROUP BY src, dst
        """,
        "hierarchy_rollup": """
            WITH RECURSIVE e AS (
              SELECT p_partkey AS src, p_partkey // 10 AS dst
              FROM part WHERE p_partkey >= 1),
            anc AS (
              SELECT src, dst FROM e
              UNION
              SELECT a.src, e.dst FROM anc a JOIN e ON a.dst = e.src),
            -- explicit UNION ALL + outer DISTINCT: inside a WITH
            -- RECURSIVE block DuckDB does not intra-batch-dedup plain
            -- UNIONs in non-recursive CTEs
            cl AS (
              SELECT DISTINCT part, node FROM (
                SELECT src AS part, dst AS node FROM anc
                UNION ALL SELECT src, src FROM e
                UNION ALL SELECT dst, dst FROM e))
            SELECT cl.node,
                   round(sum(l_quantity), 6) AS total_qty,
                   count(*) AS n_lineitems
            FROM lineitem JOIN cl ON l_partkey = cl.part
            GROUP BY cl.node
        """,
        "ngram_counts": r"""
            WITH tok AS (
              SELECT regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS t
              FROM documents),
            g AS (
              SELECT array_to_string(t[i:i+2], ' ') AS ngram
              FROM tok, unnest(generate_series(1, greatest(len(t) - 2, 0)))
                          AS u(i)),
            c AS (
              SELECT ngram, count(*) AS freq FROM g
              GROUP BY ngram HAVING count(*) >= 2),
            r AS (
              SELECT ngram, freq,
                     row_number() OVER (ORDER BY freq DESC, ngram ASC) AS rk
              FROM c)
            SELECT ngram, freq FROM r WHERE rk <= 150
        """,
        # Funnel via per-stage min-ts joins: provably the same stage
        # reach as the Spark side's greedy sorted-array walk.
        "funnel": """
            WITH t1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN t1 ON e.user_id = t1.user_id
              WHERE e.event_type = 'click' AND e.ts >= t1.t
              GROUP BY e.user_id),
            t3 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN t2 ON e.user_id = t2.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= t2.t
              GROUP BY e.user_id)
            SELECT (SELECT count(*) FROM t1) AS n_view,
                   (SELECT count(*) FROM t2) AS n_click,
                   (SELECT count(*) FROM t3) AS n_purchase
        """,
        "time_bucket_rollup": """
            SELECT date_trunc('hour', ts) AS bucket,
                   count(*) AS n_events,
                   round(sum(value), 6) AS total_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "key_skew_profile": """
            WITH c AS (
              SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
            t AS (SELECT sum(n) AS tot FROM c),
            r AS (
              SELECT key, n,
                     CAST(row_number() OVER (ORDER BY n DESC, key ASC)
                          AS INT) AS rank
              FROM c)
            SELECT key, n, round(CAST(n AS DOUBLE) / tot, 6) AS share, rank
            FROM r, t WHERE rank <= 20
        """,
        "grouped_percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
                   round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
                   round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
            FROM lineitem GROUP BY l_returnflag
        """,
        "cube_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
                     AS gid,
                   round(sum(l_quantity), 6) AS sum_qty,
                   count(*) AS n
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "pivot_events": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS n_click,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view,
                   count(*) FILTER (WHERE event_type = 'purchase')
                     AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                   count(*) FILTER (WHERE event_type = 'error') AS n_error
            FROM events GROUP BY user_id
        """,
        # The one-shot aggregation the incremental merge must equal.
        # Decimal sums (matching the Spark side) make the result exact
        # and independent of summation order, so the hash is stable.
        "incremental_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                              AS DOUBLE), 6) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                              AS DOUBLE), 6) AS sum_price,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "rolling_average": """
            SELECT event_id, user_id,
                   round(avg(value) OVER (
                     PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
                     AS rolling_avg
            FROM events
        """,
        "histogram_bins": """
            SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
                   round(CAST(floor(l_extendedprice / 5000) AS BIGINT)
                         * 5000.0, 6) AS lo_edge,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2
        """,
        # Bigram conditional log-prob under the corpus's own counts;
        # denominator is the w1-as-prefix count, not the raw unigram
        # count, so the conditional distribution sums to 1.
        "lm_score": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS t
              FROM documents),
            bg AS (
              SELECT doc_id, t[i] AS w1,
                     array_to_string(t[i:i+1], ' ') AS bigram
              FROM tok, unnest(generate_series(1, greatest(len(t) - 1, 0)))
                          AS u(i)),
            c2 AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
            c1 AS (SELECT w1, count(*) AS c FROM bg GROUP BY w1),
            scored AS (
              SELECT bg.doc_id,
                     log2(CAST(c2.c AS DOUBLE) / c1.c) AS lp
              FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1))
            SELECT doc_id, round(avg(lp), 6) AS avg_log2_prob,
                   count(*) AS n_bigrams
            FROM scored GROUP BY doc_id
        """,
        "grouped_regression": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 6)
                     AS intercept,
                   round(corr(l_quantity, l_extendedprice), 6) AS pearson_r,
                   round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        # The UNsalted join: salting must not change the result.
        "salted_skew_join": """
            SELECT c_mktsegment, count(*) AS n_events,
                   round(sum(value), 6) AS total_value
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY c_mktsegment
        """,
        "filter_dsl_nested": """
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders
            WHERE o_orderstatus = 'O'
              AND (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_totalprice > 250000)
            ORDER BY o_orderkey
        """,
        "filter_dsl_subquery": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders o
            WHERE o_orderstatus = 'F'
              AND EXISTS (
                SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey
                  AND c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 1000)
        """,
        "filter_dsl_pagination": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
            ORDER BY c_custkey LIMIT 100 OFFSET 50
        """,
        # neighbors: 2 — fixed-hop undirected BFS over the synthesized
        # nation->region edges, replicated as two explicit hop joins
        "filter_dsl_neighbors": """
            WITH v AS (
              SELECT 'N' || n_nationkey AS rid, lower(n_name) AS name FROM nation
              UNION ALL
              SELECT 'R' || r_regionkey, lower(r_name) FROM region),
            e AS (
              SELECT 'N' || n_nationkey AS src, 'R' || n_regionkey AS dst FROM nation
              UNION ALL
              SELECT 'R' || n_regionkey, 'N' || n_nationkey FROM nation),
            seed AS (SELECT rid FROM v WHERE name = 'nation_0'),
            h1 AS (
              SELECT DISTINCT e.dst AS rid FROM seed JOIN e ON e.src = seed.rid
              WHERE e.dst NOT IN (SELECT rid FROM seed)),
            h2 AS (
              SELECT DISTINCT e.dst AS rid FROM h1 JOIN e ON e.src = h1.rid
              WHERE e.dst NOT IN (SELECT rid FROM seed)
                AND e.dst NOT IN (SELECT rid FROM h1)),
            closure AS (
              SELECT rid, 0 AS _hop FROM seed
              UNION ALL SELECT rid, 1 FROM h1
              UNION ALL SELECT rid, 2 FROM h2)
            SELECT v.rid, v.name, c._hop
            FROM closure c JOIN v USING (rid)
            ORDER BY v.rid
        """,
        "top1_per_group": """
            WITH ranked AS (
              SELECT c_nationkey, c_name, c_acctbal,
                     row_number() OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
              FROM customer)
            SELECT n.n_name, r.c_name, round(r.c_acctbal, 2) AS best_acctbal
            FROM ranked r JOIN nation n ON n.n_nationkey = r.c_nationkey
            WHERE r.rn = 1
        """,
        "fallback_cascade": """
            SELECT o.o_orderkey,
                   coalesce(c1.c_name, c2.c_name) AS cust_name,
                   round(coalesce(c1.c_acctbal, c2.c_acctbal), 2) AS cust_acctbal
            FROM orders o
            LEFT JOIN customer c1 ON c1.c_custkey = o.o_custkey AND c1.c_acctbal > 0
            LEFT JOIN customer c2 ON c2.c_custkey = o.o_custkey
        """,
        "anti_join_incremental": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '1-URGENT')
        """,
        "semi_join_exists": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
        """,
        "broadcast_dim_join": """
            SELECT r.r_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name
        """,
        "normalized_key_join": """
            SELECT d.brand_uc, count(*) AS n_parts
            FROM part p
            JOIN (SELECT DISTINCT upper(p_brand) AS brand_uc FROM part) d
              ON lower(d.brand_uc) = lower(p.p_brand)
            GROUP BY d.brand_uc
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "recurrence_rollup": """
            SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
            FROM lineitem GROUP BY l_partkey
            HAVING count(DISTINCT l_suppkey) >= 4
        """,
        "consensus_agg": """
            SELECT o_custkey,
                   CASE WHEN count(DISTINCT o_orderpriority) = 1
                        THEN min(o_orderpriority) END AS consensus_priority
            FROM orders GROUP BY o_custkey
        """,
        "latest_per_key": """
            WITH ranked AS (
              SELECT o_custkey, o_orderkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
            SELECT o_custkey, o_orderkey AS latest_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate
            FROM ranked WHERE rn = 1
        """,
        "version_chain": """
            SELECT event_id, user_id,
                   CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC))) AS BIGINT) AS gap_seconds
            FROM events
        """,
        "duplicate_names": """
            SELECT p_name, count(*) AS n FROM part GROUP BY p_name HAVING count(*) > 1
        """,
        "merge_upsert": """
            WITH base AS (
              SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
              FROM orders),
            target AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0),
            source AS (
              SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 5 = 0 THEN round(o_totalprice + 1.0, 2)
                          ELSE o_totalprice END AS o_totalprice
              FROM base WHERE o_orderkey % 7 <> 0)
            SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
                   CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                        ELSE t.o_totalprice END AS o_totalprice,
                   CASE WHEN t.o_orderkey IS NULL THEN 'create'
                        WHEN s.o_orderkey IS NULL THEN 'delete'
                        WHEN s.o_totalprice <> t.o_totalprice
                          OR s.o_orderstatus <> t.o_orderstatus THEN 'update'
                        ELSE 'noop' END AS action
            FROM target t FULL OUTER JOIN source s ON s.o_orderkey = t.o_orderkey
        """,
        "reconcile": """
            WITH stored AS (
              SELECT o_custkey AS sourceId, o_orderkey AS subject,
                     o_orderpriority AS content,
                     'rid_' || o_orderkey AS rid
              FROM orders WHERE o_orderkey % 4 <> 0),
            batch AS (
              SELECT o_custkey AS sourceId, o_orderkey AS subject,
                     CASE WHEN o_orderkey % 2 = 0 THEN 'REVISED'
                          ELSE o_orderpriority END AS content,
                     'new_' || o_orderkey AS rid
              FROM orders WHERE o_orderkey % 5 <> 0),
            -- pass 1: exact content-key (subject) match within the group
            p1 AS (
              SELECT b.sourceId, b.subject, b.content, s.rid
              FROM batch b JOIN stored s
                ON s.sourceId = b.sourceId AND s.subject = b.subject),
            -- leftovers, ranked positionally within the group
            lo AS (
              SELECT s.*, row_number() OVER (PARTITION BY sourceId
                                             ORDER BY subject, content) AS rn
              FROM stored s WHERE NOT EXISTS (
                SELECT 1 FROM batch b
                WHERE b.sourceId = s.sourceId AND b.subject = s.subject)),
            ln AS (
              SELECT b.*, row_number() OVER (PARTITION BY sourceId
                                             ORDER BY subject, content) AS rn
              FROM batch b WHERE NOT EXISTS (
                SELECT 1 FROM stored s
                WHERE s.sourceId = b.sourceId AND s.subject = b.subject)),
            -- pass 3: artificial positional pairing of leftovers
            p3 AS (
              SELECT coalesce(ln.sourceId, lo.sourceId) AS sourceId,
                     CASE WHEN ln.rid IS NOT NULL THEN ln.subject
                          ELSE lo.subject END AS subject,
                     CASE WHEN ln.rid IS NOT NULL THEN ln.content
                          ELSE lo.content END AS content,
                     CASE WHEN ln.rid IS NOT NULL AND lo.rid IS NOT NULL THEN lo.rid
                          WHEN ln.rid IS NOT NULL THEN ln.rid ELSE lo.rid END AS rid,
                     CASE WHEN ln.rid IS NOT NULL AND lo.rid IS NOT NULL THEN 'update'
                          WHEN ln.rid IS NOT NULL THEN 'create'
                          ELSE 'delete' END AS action
              FROM ln FULL OUTER JOIN lo
                ON lo.sourceId = ln.sourceId AND lo.rn = ln.rn)
            SELECT sourceId, subject, content, rid, 'update' AS action FROM p1
            UNION ALL
            SELECT sourceId, subject, content, rid, action FROM p3
        """,
        "incremental_merge": """
            WITH ev AS (
              SELECT user_id, event_id, ts, event_type, round(value, 4) AS value
              FROM events),
            target AS (
              SELECT * FROM (
                SELECT user_id, event_id, ts, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM ev WHERE ts < TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1),
            fresh AS (
              SELECT * FROM (
                SELECT user_id, event_id, ts, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM ev WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1)
            SELECT coalesce(f.user_id, t.user_id) AS user_id,
                   strftime(CASE WHEN f.user_id IS NOT NULL THEN f.ts ELSE t.ts END,
                            '%Y-%m-%d %H:%M:%S') AS latest_ts,
                   CASE WHEN f.user_id IS NOT NULL THEN f.event_type
                        ELSE t.event_type END AS event_type,
                   CASE WHEN f.user_id IS NOT NULL THEN f.value ELSE t.value END AS value,
                   CASE WHEN t.user_id IS NULL THEN 'create'
                        WHEN f.user_id IS NULL THEN 'keep'
                        WHEN f.event_id <> t.event_id OR f.ts <> t.ts
                          OR f.event_type <> t.event_type
                          OR f.value <> t.value THEN 'update'
                        ELSE 'noop' END AS action
            FROM target t FULL OUTER JOIN fresh f ON f.user_id = t.user_id
        """,
        "stable_hash_id": """
            SELECT n_nationkey, n_name,
                   md5('{"n_name":"' || n_name || '","n_nationkey":' || n_nationkey || '}')
                     AS rid
            FROM nation
        """,
        "kb_ontology_load": """
            WITH src AS (SELECT md5('{"cls":"Source","name":"tpch"}') AS srid),
            recs AS (
              SELECT 'R' || r_regionkey AS sourceId, lower(r_name) AS name,
                     CAST(NULL AS VARCHAR) AS parent_sid
              FROM region
              UNION ALL
              SELECT 'N' || n_nationkey, lower(n_name), 'R' || n_regionkey
              FROM nation)
            SELECT r.sourceId, r.name,
                   md5('{"cls":"Vocabulary","name":"' || r.name
                       || '","sourceId":"' || r.sourceId
                       || '","sourceIdVersion":null,"source_rid":"'
                       || (SELECT srid FROM src) || '"}') AS rid,
                   r.parent_sid
            FROM recs r
        """,
        # full replica of batch addVariant over synthesized notations:
        # same branch algebra, same content-hash rids, same Infers links
        "variant_load": """
            WITH src AS (
              SELECT DISTINCT CAST(p_partkey % 50 AS INT) AS g,
                     CAST(CAST(floor(p_partkey / 50) AS INT) % 5 AS INT) AS b
              FROM part),
            rows_ AS (
              SELECT g, b, g*10 + b + 1 AS n,
                CASE b
                  WHEN 0 THEN 'G'||g||':p.G'||(g*10 + b + 1)||'D'
                  WHEN 1 THEN 'G'||g||':e.'||(g*10 + b + 1)||'del'
                  WHEN 2 THEN 'G'||g||':c.'||(g*10 + b + 1)||'A>G'
                  WHEN 3 THEN 'G'||g||':g.'||(g*10 + b + 1)||'_'||(g*10 + b + 3)||'del'
                  ELSE '(GA'||g||',GB'||g||'):fusion(e.1,e.3)'
                END AS notation
              FROM src)
            SELECT
              md5('{"cls":"PositionalVariant","displayName":"' || notation
                  || '","source":"variant-demo"}') AS rid,
              notation AS displayName,
              'PositionalVariant' AS cls,
              CASE b WHEN 0 THEN 'v-missense' WHEN 1 THEN 'v-deletion'
                     WHEN 2 THEN 'v-substitution' WHEN 3 THEN 'v-deletion'
                     ELSE 'v-fusion' END AS type_rid,
              CASE WHEN b < 4 THEN 'f-G'||g ELSE 'f-GA'||g END AS reference1_rid,
              CASE WHEN b = 4 THEN 'f-GB'||g END AS reference2_rid,
              CASE b WHEN 0 THEN 'ProteinPosition' WHEN 1 THEN 'ExonicPosition'
                     WHEN 2 THEN 'CdsPosition' WHEN 3 THEN 'GenomicPosition'
                     ELSE 'ExonicPosition' END AS b1_cls,
              CASE WHEN b = 4 THEN 1 ELSE n END AS b1_pos,
              CASE WHEN b = 0 THEN 'G' END AS b1_ref_aa,
              CASE WHEN b = 3 THEN 'GenomicPosition'
                   WHEN b = 4 THEN 'ExonicPosition' END AS b2_cls,
              CASE WHEN b = 3 THEN n + 2 WHEN b = 4 THEN 3 END AS b2_pos,
              CASE WHEN b = 2 THEN 'A' END AS ref_seq,
              CASE WHEN b = 2 THEN 'G' END AS alt_seq,
              CASE WHEN b IN (1, 2, 3) THEN
                md5('{"cls":"PositionalVariant","displayName":"G' || g
                    || ':p.G' || (g*10 + 1)
                    || 'D","source":"variant-demo"}')
              END AS infers_rid
            FROM rows_
        """,
        "oncokb_names": """
            SELECT p_partkey,
                   CASE
                     WHEN p_partkey % 4 = 0 THEN 'G' || (p_partkey % 500 + 1) || 'D'
                     WHEN p_partkey % 4 = 1
                       THEN 'exon ' || (p_partkey % 30 + 1) || ' deletion'
                     WHEN p_partkey % 4 = 2 THEN 'BCR-ABL1'
                     ELSE 'Truncating Mutations'
                   END AS variant_name,
                   CASE
                     WHEN p_partkey % 4 = 0
                       THEN 'p.g' || (p_partkey % 500 + 1) || 'd'
                     WHEN p_partkey % 4 = 1 THEN 'e.' || (p_partkey % 30 + 1) || 'del'
                     WHEN p_partkey % 4 = 2 THEN 'fusion'
                     ELSE 'truncating'
                   END AS vtype,
                   CASE WHEN p_partkey % 4 = 2 THEN 'bcr' END AS reference2,
                   CASE WHEN p_partkey % 4 = 2 THEN TRUE END AS flipped
            FROM part
        """,
        "hotspot_load": """
            WITH raw AS (
              SELECT p_partkey,
                     CAST(p_partkey % 22 + 1 AS VARCHAR) AS chromosome,
                     (['pathogenic', '', 'likely_benign', 'uncertain'])[p_partkey % 4 + 1]
                       AS clin_sig,
                     p_brand AS disease_id,
                     CASE WHEN p_partkey % 3 = 1 THEN 'MODERATE' ELSE 'HIGH' END AS impact,
                     'p.G' || p_partkey
                       || CASE WHEN p_partkey % 7 = 0 THEN '='
                               WHEN p_partkey % 7 = 1 THEN '_splice'
                               ELSE 'D' END AS protein,
                     (['G', '-', 'GAA', 'A', 'C'])[p_partkey % 5 + 1] AS raw_ref,
                     CAST(p_partkey AS VARCHAR) AS start_pos,
                     CAST(p_partkey + p_partkey % 3 AS VARCHAR) AS stop_pos,
                     'T' || p_partkey AS transcript,
                     (['A', 'T', '-', 'TG'])[p_partkey % 4 + 1] AS raw_alt
              FROM part),
            kept AS (
              SELECT *,
                     CASE WHEN raw_ref = '-' THEN '' ELSE raw_ref END AS ref,
                     CASE WHEN raw_alt = '-' THEN '' ELSE raw_alt END AS alt
              FROM raw
              WHERE lower(impact) = 'high'
                AND clin_sig <> '' AND clin_sig NOT LIKE '%benign%'
                AND protein NOT LIKE '%=' AND protein NOT LIKE '%\\_splice' ESCAPE '\\')
            SELECT p_partkey, chromosome, protein,
                   chromosome || ':g.' ||
                   CASE
                     WHEN len(ref) = 1 AND len(alt) = 1 THEN start_pos || ref || '>' || alt
                     WHEN len(ref) > 0 AND len(alt) > 0
                       THEN start_pos || '_' || stop_pos || 'del' || ref || 'ins' || alt
                     WHEN len(ref) = 0 THEN start_pos || '_' || stop_pos || 'ins' || alt
                     ELSE start_pos || '_' || stop_pos || 'del' || ref
                   END AS genomic,
                   transcript || ':' || protein AS protein_notation,
                   'mutation hotspot' AS relevance,
                   array_to_string(
                     list_sort([transcript || ':' || protein, disease_id]), '|') AS conds
            FROM kept
        """,
        "oncokb_statements": """
            WITH raw AS (
              SELECT p_partkey,
                     lower(trim(p_type)) AS gene,
                     'V' || p_size AS variant,
                     (['1', '2A', 'R1', 'r2', 'X9'])[p_partkey % 5 + 1] AS level,
                     string_split(p_name, ' ')[1] || ', ' || p_brand AS drugs,
                     p_partkey || ',' || (p_partkey + 1) AS pmids,
                     CASE WHEN p_partkey % 2 = 0 THEN 'Abst ' || p_partkey || '; ' END
                       AS abstracts
              FROM part),
            rel AS (
              SELECT *,
                     CASE WHEN regexp_matches(lower(trim(level)), '^r[0-9]+$')
                            THEN 'resistance'
                          WHEN regexp_matches(lower(trim(level)), '^[0-9]+[a-z]?$')
                            THEN 'sensitivity' END AS relevance,
                     array_to_string(
                       list_filter(
                         list_transform(string_split(pmids, ','), x -> trim(x))
                         || list_transform(string_split(coalesce(abstracts, ''), ';'),
                                           x -> trim(x)),
                         x -> x <> ''), ';') AS support_str
              FROM raw)
            SELECT p_partkey, gene, variant, relevance,
                   lower(trim(u.drug)) AS drug,
                   support_str,
                   CASE WHEN relevance IS NULL
                        THEN 'did not recognize evidence level (' || level || ')' END
                     AS _error
            FROM rel, unnest(string_split(drugs, ',')) AS u(drug)
            WHERE len(lower(trim(u.drug))) > 0
        """,
        "docm_fix": """
            WITH src AS (
              SELECT p_partkey, p_partkey % 800 + 1 AS n,
                     CASE
                       WHEN p_partkey % 3 = 0 THEN 'p.KK' || (p_partkey % 800 + 1) || '-'
                       WHEN p_partkey % 3 = 1 THEN 'p.DI' || (p_partkey % 800 + 1) || 'VM'
                       ELSE 'p.G' || (p_partkey % 800 + 1) || 'D'
                     END AS variant
              FROM part)
            SELECT p_partkey, variant,
                   CASE
                     WHEN p_partkey % 3 = 0
                       THEN 'p.K' || n || '_K' || (n + 1) || 'delKK'
                     WHEN p_partkey % 3 = 1
                       THEN 'p.D' || n || '_I' || (n + 1) || 'delDIinsVM'
                     ELSE variant
                   END AS fixed
            FROM src
        """,
        "citation_phase_year": """
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 2 = 0
                        THEN CAST(o_orderkey AS VARCHAR) END AS abstract_number,
                   CASE WHEN o_orderkey % 2 = 0 THEN 'ASCO' END AS abstract_source,
                   CASE WHEN o_orderkey % 2 = 0 THEN 2014 END AS abstract_year,
                   CAST(o_orderkey % 3 + 1 AS VARCHAR) AS phase,
                   CAST(year(o_orderdate) AS INTEGER) AS pub_year
            FROM orders
        """,
        "relevance_translate": f"""
            WITH rel(evidence_type, direction, significance, relevance) AS (
              VALUES {', '.join(
                  '(' + ', '.join(repr(v) for v in row) + ')' for row in RELEVANCE_ROWS
              )}),
            src AS (
              SELECT o_orderkey,
                     ['PREDICTIVE', 'DIAGNOSTIC', 'PROGNOSTIC',
                      'FUNCTIONAL'][o_orderkey % 4 + 1] AS evidence_type,
                     CASE WHEN o_orderkey % 2 = 0 THEN 'SUPPORTS'
                          ELSE 'DOES_NOT_SUPPORT' END AS direction,
                     ['SENSITIVITYRESPONSE', 'RESISTANCE', 'POSITIVE', 'POOR_OUTCOME',
                      'GAIN_OF_FUNCTION'][o_orderkey % 5 + 1] AS significance
              FROM orders)
            SELECT s.o_orderkey, s.evidence_type, s.direction, s.significance, r.relevance
            FROM src s LEFT JOIN rel r
              ON r.evidence_type = s.evidence_type AND r.direction = s.direction
             AND r.significance = s.significance
        """,
        "set_ops": """
            SELECT o_custkey, 'union_except' AS op FROM (
              (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
               UNION
               SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
              EXCEPT
              SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
            UNION ALL
            SELECT o_custkey, 'intersect' AS op FROM (
              SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
              INTERSECT
              SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        """,
        "therapy_grouping": """
            SELECT o_orderkey, t.g AS group_name, CAST(NULL AS VARCHAR) AS err
            FROM orders, unnest(
              CASE WHEN o_orderkey % 4 = 0 THEN ['tA', 'tB']
                   WHEN o_orderkey % 4 = 1 THEN ['tC']
                   WHEN o_orderkey % 4 = 2 THEN ['tA+tB']
                   ELSE [''] END) AS t(g)
        """,
        "string_normalizers": """
            WITH src AS (
              SELECT c_custkey,
                     '  Acute  ' || CASE WHEN c_custkey % 2 = 0 THEN 'Leukaemia'
                                         ELSE 'Tumour' END || '_Of Breast '
                       AS disease_raw,
                     'The <em>Title</em> No ' || (c_custkey % 50) || '.' AS title_raw,
                     CASE WHEN c_custkey % 3 = 0 THEN 'ABL1'
                          WHEN c_custkey % 3 = 1 THEN 'abl'
                          ELSE 'ERBB21' END AS gene_raw,
                     CASE WHEN c_custkey % 4 = 0 THEN 'None'
                          WHEN c_custkey % 4 = 1 THEN ' '
                          ELSE 'real' END AS nullish_raw
              FROM customer)
            SELECT c_custkey,
                   regexp_replace(lower(trim(disease_raw)), '\\s+', ' ', 'g')
                     AS norm_space,
                   regexp_replace(regexp_replace(
                     regexp_replace(lower(trim(regexp_replace(disease_raw, '_', ' ', 'g'))),
                                    '\\s+', ' ', 'g'),
                     'leukaemia', 'leukemia', 'g'), 'tumour', 'tumor', 'g')
                     AS disease_key,
                   regexp_replace(lower(trim(regexp_replace(title_raw, '</?em>', '', 'g'))),
                                  '\\.$', '') AS title_key,
                   regexp_replace(
                     regexp_replace(lower(trim(gene_raw)), '\\s+', ' ', 'g'),
                     '^([a-z]{3,})1$', '\\1') AS gene_key,
                   CASE WHEN trim(nullish_raw) IN ('None', '') THEN NULL
                        ELSE nullish_raw END AS nullish
            FROM src
        """,
        # replica of the compiled JSON-Schema predicates in document
        # order: meta.total maximum, meta.status pattern, tags[] pattern
        "spec_validation_nested": """
            WITH checks AS (
              SELECT o_orderkey,
                     list_filter([
                       CASE WHEN o_totalprice > 300000
                            THEN '#/meta/total: above maximum 300000' END,
                       CASE WHEN o_orderkey % 7 <> 0
                                  AND NOT regexp_matches(o_orderstatus, '^[OF]$')
                            THEN '#/meta/status: pattern ^[OF]$ unmatched' END,
                       CASE WHEN o_orderkey % 11 <> 5
                                  AND o_orderkey % 5 IN (3, 4)
                            THEN '#/tags[]: element pattern unmatched' END
                     ], x -> x IS NOT NULL) AS errs_list
              FROM orders)
            SELECT o_orderkey,
                   coalesce(array_to_string(errs_list, ';'), '') AS errs,
                   CAST(len(errs_list) AS INTEGER) AS n_errors
            FROM checks
        """,
        "spec_validation": """
            SELECT o_orderkey,
                   coalesce(array_to_string(list_filter([
                     CASE WHEN NOT coalesce(o_totalprice < 300000, FALSE)
                          THEN 'price-cap' END,
                     CASE WHEN NOT coalesce(o_orderpriority <> '1-URGENT', FALSE)
                          THEN 'not-urgent' END,
                     CASE WHEN NOT coalesce(o_orderdate IS NOT NULL, FALSE)
                          THEN 'date-present' END
                   ], x -> x IS NOT NULL), ';'), '') AS errs,
                   len(list_filter([
                     CASE WHEN NOT coalesce(o_totalprice < 300000, FALSE)
                          THEN 'price-cap' END,
                     CASE WHEN NOT coalesce(o_orderpriority <> '1-URGENT', FALSE)
                          THEN 'not-urgent' END,
                     CASE WHEN NOT coalesce(o_orderdate IS NOT NULL, FALSE)
                          THEN 'date-present' END
                   ], x -> x IS NOT NULL)) AS n_errors
            FROM orders
        """,
        "full_reload_diff": """
            WITH o AS (SELECT DISTINCT md5(CAST(o_orderkey AS VARCHAR)) AS rid
                       FROM orders WHERE o_orderkey % 3 <> 0),
            r AS (SELECT DISTINCT md5(CAST(o_orderkey AS VARCHAR)) AS rid
                  FROM orders WHERE o_orderkey % 5 <> 0)
            SELECT coalesce(o.rid, r.rid) AS rid,
                   CASE WHEN o.rid IS NOT NULL AND r.rid IS NOT NULL THEN 'keep'
                        WHEN o.rid IS NOT NULL THEN 'delete'
                        ELSE 'create' END AS action
            FROM o FULL OUTER JOIN r ON o.rid = r.rid
        """,
        "combo_naming": """
            SELECT l_orderkey,
                   list_aggregate(list_sort(list_distinct(
                       list(l_returnflag || l_linestatus))), 'string_agg', ' + ') AS combo
            FROM lineitem GROUP BY l_orderkey
        """,
        "rollup_recurrence": """
            SELECT l_returnflag, l_linestatus, count(DISTINCT l_suppkey) AS n_supp
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
            HAVING count(DISTINCT l_suppkey) >= 50
        """,
        "hgvs_parse": """
            WITH src AS (
              SELECT l_orderkey, l_linenumber,
                     l_linenumber % 7 AS b, l_partkey AS pk,
                     'p' || (l_partkey % 30 + 1) || '.' || (l_partkey % 9 + 1) AS cb1,
                     'p' || (l_partkey % 20 + 1) || '.' || (l_partkey % 7 + 1) AS cb2
              FROM lineitem),
            m AS (
              SELECT l_orderkey, l_linenumber,
                     CASE b
                       WHEN 0 THEN 'p.G' || (pk % 500 + 1) || 'D'
                       WHEN 1 THEN 'c.' || (pk % 900 + 1) || 'A>T'
                       WHEN 2 THEN 'e.' || (pk % 20 + 1) || 'del'
                       WHEN 3 THEN 'c.' || (pk % 900 + 1) || '+2A>G'
                       WHEN 4 THEN 'i.' || (pk % 30 + 1) || 'mut'
                       WHEN 5 THEN 'y.' || cb1 || '_' || cb2 || 'del'
                       ELSE 'p.(G' || (pk % 500 + 1) || '_G' || (pk % 500 + 2) || ')mut'
                     END AS notation,
                     CASE b WHEN 0 THEN 'p' WHEN 1 THEN 'c' WHEN 2 THEN 'e'
                            WHEN 3 THEN 'c' WHEN 4 THEN 'i' WHEN 5 THEN 'y'
                            ELSE 'p' END AS prefix,
                     CASE b WHEN 0 THEN 'missense' WHEN 1 THEN 'substitution'
                            WHEN 2 THEN 'deletion' WHEN 3 THEN 'substitution'
                            WHEN 4 THEN 'mutation' WHEN 5 THEN 'deletion'
                            ELSE 'mutation' END AS variant_type,
                     CASE b WHEN 0 THEN pk % 500 + 1 WHEN 1 THEN pk % 900 + 1
                            WHEN 2 THEN pk % 20 + 1 WHEN 3 THEN pk % 900 + 1
                            WHEN 4 THEN pk % 30 + 1 WHEN 5 THEN NULL
                            ELSE pk % 500 + 1 END AS break1_start,
                     CASE b WHEN 3 THEN (pk % 900 + 1) || '+2'
                            WHEN 5 THEN cb1
                            ELSE CAST(
                              CASE b WHEN 0 THEN pk % 500 + 1
                                     WHEN 1 THEN pk % 900 + 1
                                     WHEN 2 THEN pk % 20 + 1
                                     WHEN 4 THEN pk % 30 + 1
                                     ELSE pk % 500 + 1 END AS VARCHAR)
                     END AS break1_repr,
                     CASE b WHEN 5 THEN cb2
                            WHEN 6 THEN CAST(pk % 500 + 2 AS VARCHAR) END AS break2_repr,
                     CASE b WHEN 6 THEN 1 END AS uncertain
              FROM src)
            SELECT l_orderkey, l_linenumber, notation, prefix, variant_type,
                   CAST(break1_start AS INTEGER) AS break1_start,
                   break1_repr, break2_repr, CAST(uncertain AS INTEGER) AS uncertain
            FROM m
        """,
        "explode_expansion": """
            SELECT t.type_word, count(*) AS n
            FROM part p, unnest(string_split(p.p_type, ' ')) AS t(type_word)
            GROUP BY t.type_word
        """,
        "cross_expansion": """
            SELECT p.p_partkey, t.type_word, v.variant
            FROM part p,
                 unnest(string_split(p.p_type, ' ')) AS t(type_word),
                 unnest(['A', 'B']) AS v(variant)
            WHERE p.p_partkey <= 200
        """,
        "dnf_expansion": """
            WITH src AS (
              SELECT o_orderkey,
                     'v' || (o_orderkey % 7) || ' AND (v' || (o_orderkey % 5) ||
                     ' OR v' || (o_orderkey % 3) || ')' AS expr,
                     'v' || (o_orderkey % 7) AS a,
                     'v' || (o_orderkey % 5) AS b,
                     'v' || (o_orderkey % 3) AS c
              FROM orders WHERE o_orderkey <= 2000),
            expanded AS (
              SELECT o_orderkey, expr,
                     list_aggregate(list_sort(list_distinct([a, b])), 'string_agg', '+')
                       AS conj1,
                     list_aggregate(list_sort(list_distinct([a, c])), 'string_agg', '+')
                       AS conj2
              FROM src)
            SELECT o_orderkey, expr, unnest([conj1, conj2]) AS conditions
            FROM expanded
        """,
        "ngram_jaccard": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "embedding_quantize": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
              FROM embeddings),
            s AS (
              SELECT vec_id, xs,
                     greatest(list_max(list_transform(xs, x -> abs(x))), 1e-12)
                       / 127.0 AS scale
              FROM v),
            q AS (
              SELECT vec_id, xs, scale,
                     list_transform(xs, x -> CAST(round(x / scale) AS INT)) AS qv
              FROM s)
            SELECT vec_id,
                   round(scale, 6) AS qscale,
                   CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS qnorm,
                   round(list_max(list_transform(list_zip(xs, qv),
                     p -> abs(p[1] - p[2] * scale))), 6) AS recon_err
            FROM q
        """,
        "stratified_sample": """
            WITH sampled AS (
              SELECT doc_id, lang, source, n_chars
              FROM documents
              WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                    < CASE lang WHEN 'en' THEN 25 WHEN 'de' THEN 50
                                WHEN 'es' THEN 50 WHEN 'fr' THEN 50 ELSE 100 END),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY lang, source
                                           ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM sampled)
            SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn <= 3
        """,
        "bm25_scores": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), x -> x <> '') AS w
              FROM documents),
            stats AS (SELECT count(*) AS N, avg(len(w)) AS avgdl FROM w),
            tf AS (
              SELECT doc_id, t, count(*) AS tf, max(len(w)) AS dl
              FROM w, unnest(w.w) AS u(t)
              WHERE t IN ('spark', 'merge', 'stream')
              GROUP BY doc_id, t),
            dfq AS (SELECT t, count(*) AS df_ FROM tf GROUP BY t)
            SELECT doc_id,
                   round(sum(
                     ln(1 + (N - df_ + 0.5) / (df_ + 0.5))
                     * tf * 2.2
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                   ), 4) AS bm25
            FROM tf JOIN dfq USING (t) CROSS JOIN stats
            GROUP BY doc_id
        """,
        # transitive closure of the near-dup pair graph via recursive
        # CTE; component label = min reachable doc_id (matches the
        # min-label-propagation fixpoint exactly)
        # CC labels (recursive CTE) + per-cluster argmax & size.
        "canonical_docs": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            prs AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            edges AS (
              SELECT u, v FROM prs UNION ALL SELECT v, u FROM prs),
            reach(n, lab) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.n, e.v FROM reach r JOIN edges e ON e.u = r.lab),
            comp AS (SELECT n AS doc_id, min(lab) AS comp FROM reach GROUP BY n),
            lab AS (
              SELECT c.comp, d.doc_id, d.n_chars,
                     row_number() OVER (PARTITION BY c.comp
                       ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn,
                     CAST(count(*) OVER (PARTITION BY c.comp) AS BIGINT)
                       AS cluster_size
              FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
            SELECT comp, doc_id, n_chars, cluster_size FROM lab WHERE rn = 1
        """,
        # dedup_components is built below by surgery on minhash_lsh:
        # since round 11 its pair input is the MinHash-LSH verified
        # pairs (VERDICT r10 #1 — the probe-proven linear scale path),
        # so the oracle must replicate that banding pipeline, not the
        # exact n-gram join.
        # Exact-substring repeated passages: identical normalize /
        # 5-gram / md5-prefix digest pipeline, duplicated digests
        # (count >= 2 corpus-wide), gaps-and-islands span merge.
        "repeated_spans": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            g AS (
              SELECT doc_id,
                     unnest([{'p': i - 1,
                              'd': ('0x' || substr(md5(array_to_string(w[i:i+4], ' ')), 1, 15))::BIGINT}
                             for i in generate_series(1, len(w) - 4)]) AS u
              FROM words WHERE len(w) >= 5),
            e AS (SELECT doc_id, u.p AS p, u.d AS d FROM g),
            f AS (SELECT d FROM e GROUP BY d HAVING count(*) >= 2),
            dp AS (SELECT doc_id, p FROM e JOIN f USING (d)),
            m AS (SELECT doc_id, p,
                         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                                                    ORDER BY p) > 5
                              THEN 1 ELSE 0 END AS b
                  FROM dp),
            i AS (SELECT doc_id, p,
                         sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS isl
                  FROM m)
            SELECT doc_id,
                   CAST(min(p) AS BIGINT) AS span_start,
                   CAST(max(p) + 4 AS BIGINT) AS span_end,
                   CAST(max(p) + 4 - min(p) + 1 AS BIGINT) AS span_tokens
            FROM i GROUP BY doc_id, isl
        """,
        # ExactSubstr cleaning pass: identical span pipeline, then
        # re-join the uncovered tokens in order (spans are disjoint by
        # construction, so the coverage left-join never duplicates).
        "repeated_span_cut": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            g AS (
              SELECT doc_id,
                     unnest([{'p': i - 1,
                              'd': ('0x' || substr(md5(array_to_string(w[i:i+4], ' ')), 1, 15))::BIGINT}
                             for i in generate_series(1, len(w) - 4)]) AS u
              FROM words WHERE len(w) >= 5),
            e AS (SELECT doc_id, u.p AS p, u.d AS d FROM g),
            f AS (SELECT d FROM e GROUP BY d HAVING count(*) >= 2),
            dp AS (SELECT doc_id, p FROM e JOIN f USING (d)),
            m AS (SELECT doc_id, p,
                         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                                                    ORDER BY p) > 5
                              THEN 1 ELSE 0 END AS b
                  FROM dp),
            isl AS (SELECT doc_id, p,
                           sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS i2
                    FROM m),
            spans AS (SELECT doc_id, min(p) AS s, max(p) + 4 AS e2
                      FROM isl GROUP BY doc_id, i2),
            tok AS (
              SELECT doc_id,
                     unnest([{'i': i - 1, 't': w[i]}
                             for i in generate_series(1, len(w))]) AS u
              FROM words),
            tk AS (SELECT doc_id, u.i AS i, u.t AS t FROM tok),
            kept AS (
              SELECT t.doc_id, t.i, t.t
              FROM tk t LEFT JOIN spans s
                ON s.doc_id = t.doc_id AND t.i BETWEEN s.s AND s.e2
              WHERE s.doc_id IS NULL),
            agg AS (SELECT doc_id, count(*) AS kept_n,
                           string_agg(t, ' ' ORDER BY i) AS ct
                    FROM kept GROUP BY doc_id)
            SELECT w.doc_id,
                   CAST(len(w.w) AS BIGINT) AS n_tokens,
                   CAST(len(w.w) - coalesce(a.kept_n, 0) AS BIGINT)
                     AS removed_tokens,
                   coalesce(a.ct, '') AS clean_text
            FROM words w LEFT JOIN agg a USING (doc_id)
        """,
        # Exact 8-gram benchmark decontamination: identical digest
        # pipeline, bench = every 50th doc, per-doc hit counts.
        "exactsubstr_decontaminate": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            bd AS (
              SELECT DISTINCT
                     ('0x' || substr(md5(g), 1, 15))::BIGINT AS d
              FROM (SELECT unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS g
                    FROM words WHERE doc_id % 50 = 0 AND len(w) >= 8)),
            cg AS (
              SELECT doc_id,
                     unnest([('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT
                             for i in generate_series(1, len(w) - 7)]) AS d
              FROM words WHERE len(w) >= 8),
            hits AS (
              SELECT doc_id, count(*) AS h
              FROM cg JOIN bd USING (d) GROUP BY doc_id)
            SELECT w.doc_id,
                   CAST(greatest(len(w.w) - 7, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(h.h, 0) AS BIGINT) AS k_gram_hits,
                   coalesce(h.h, 0) >= 1 AS contaminated
            FROM words w LEFT JOIN hits h USING (doc_id)
        """,
        # Suite-level decontamination FLAG (r15): the exactsubstr
        # pipeline with the digest side widened to (set, digest) over
        # four eval sets (every 5th doc, doc_id % 4); hits count
        # DISTINCT matched positions against the UNION of digests,
        # attribution counts per-set matches ("set=hits" sorted by
        # the set's VARCHAR form). Shared verbatim by the streaming
        # gate (stream_multi_decontaminate — value-equal by design).
        "multi_benchmark_flag": r"""
            WITH words AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            bg AS MATERIALIZED (
              SELECT DISTINCT CAST(doc_id % 4 AS VARCHAR) AS st,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT AS d
              FROM (SELECT doc_id,
                           unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS g
                    FROM words WHERE doc_id % 5 = 0 AND len(w) >= 8)),
            bd AS (SELECT DISTINCT d FROM bg),
            cg AS MATERIALIZED (
              SELECT doc_id,
                     unnest([('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT
                             for i in generate_series(1, len(w) - 7)]) AS d
              FROM words WHERE len(w) >= 8),
            hits AS (
              SELECT doc_id, count(*) AS h
              FROM cg JOIN bd USING (d) GROUP BY doc_id),
            perset AS (
              SELECT cg.doc_id, bg.st, count(*) AS c
              FROM cg JOIN bg USING (d) GROUP BY cg.doc_id, bg.st),
            attr AS (
              SELECT doc_id, count(*) AS n_leak_sets,
                     string_agg(st || '=' || CAST(c AS VARCHAR),
                                ',' ORDER BY st) AS leak_attribution
              FROM perset GROUP BY doc_id)
            SELECT w.doc_id,
                   CAST(greatest(len(w.w) - 7, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(h.h, 0) AS BIGINT) AS k_gram_hits,
                   coalesce(h.h, 0) >= 1 AS contaminated,
                   CAST(coalesce(a.n_leak_sets, 0) AS BIGINT) AS n_leak_sets,
                   coalesce(a.leak_attribution, '') AS leak_attribution
            FROM words w LEFT JOIN hits h USING (doc_id)
                         LEFT JOIN attr a USING (doc_id)
        """,
        # Eval-integrity leak report: per benchmark item (every 50th
        # doc), distinct 8-gram digests vs the corpus gram stream —
        # leaked distinct grams, distinct leaking corpus docs, frac.
        "benchmark_leak_report": r"""
            WITH words AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            bg AS (
              SELECT DISTINCT doc_id AS bid,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT AS d
              FROM (SELECT doc_id,
                           unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS g
                    FROM words WHERE doc_id % 50 = 0 AND len(w) >= 8)),
            cg AS (
              SELECT doc_id AS cid,
                     unnest([('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT
                             for i in generate_series(1, len(w) - 7)]) AS d
              FROM words WHERE len(w) >= 8),
            m AS (
              SELECT bg.bid,
                     count(DISTINCT bg.d) AS leaked_grams,
                     count(DISTINCT cg.cid) AS leaking_docs
              FROM cg JOIN bg USING (d) GROUP BY bg.bid),
            tot AS (SELECT bid, count(*) AS n_distinct_grams
                    FROM bg GROUP BY bid),
            items AS (SELECT DISTINCT doc_id AS bid FROM words
                      WHERE doc_id % 50 = 0)
            SELECT i.bid AS doc_id,
                   CAST(coalesce(t.n_distinct_grams, 0) AS BIGINT)
                     AS n_distinct_grams,
                   CAST(coalesce(m.leaked_grams, 0) AS BIGINT)
                     AS leaked_grams,
                   CAST(coalesce(m.leaking_docs, 0) AS BIGINT)
                     AS leaking_docs,
                   CASE WHEN coalesce(t.n_distinct_grams, 0) > 0
                        THEN round(CAST(coalesce(m.leaked_grams, 0) AS DOUBLE)
                                   / t.n_distinct_grams, 6)
                        ELSE 0.0 END AS leaked_frac,
                   coalesce(m.leaking_docs, 0) >= 1 AS leaked
            FROM items i LEFT JOIN tot t USING (bid)
                         LEFT JOIN m USING (bid)
        """,
        # Suite-level eval-integrity report (r16): per item of the
        # four synthetic eval sets (every 5th doc, doc_id % 4),
        # distinct-8-gram leak totals vs the corpus plus the
        # worst-document attribution (max shared distinct grams,
        # ties to the smallest corpus id).
        "multi_benchmark_leak_report": r"""
            WITH words AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            bg AS MATERIALIZED (
              SELECT DISTINCT doc_id AS bid,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT AS d
              FROM (SELECT doc_id,
                           unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS g
                    FROM words WHERE doc_id % 5 = 0 AND len(w) >= 8)),
            cg AS (
              SELECT doc_id AS cid,
                     unnest([('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT
                             for i in generate_series(1, len(w) - 7)]) AS d
              FROM words WHERE len(w) >= 8),
            hits AS MATERIALIZED (
              SELECT DISTINCT bg.bid, cg.cid, bg.d
              FROM cg JOIN bg USING (d)),
            m AS (
              SELECT bid, count(DISTINCT d) AS leaked_grams,
                     count(DISTINCT cid) AS leaking_docs
              FROM hits GROUP BY bid),
            pair AS (
              SELECT bid, cid, count(*) AS sh
              FROM hits GROUP BY bid, cid),
            worst AS (
              SELECT bid, cid AS worst_doc, sh AS worst_doc_shared
              FROM (SELECT bid, cid, sh,
                           row_number() OVER (PARTITION BY bid
                                              ORDER BY sh DESC, cid ASC) AS rn
                    FROM pair)
              WHERE rn = 1),
            tot AS (SELECT bid, count(*) AS n_distinct_grams
                    FROM bg GROUP BY bid),
            items AS (SELECT DISTINCT doc_id AS bid,
                             (doc_id % 4) AS bench_set
                      FROM documents WHERE doc_id % 5 = 0)
            SELECT i.bid AS doc_id,
                   i.bench_set,
                   CAST(coalesce(t.n_distinct_grams, 0) AS BIGINT)
                     AS n_distinct_grams,
                   CAST(coalesce(m.leaked_grams, 0) AS BIGINT)
                     AS leaked_grams,
                   CAST(coalesce(m.leaking_docs, 0) AS BIGINT)
                     AS leaking_docs,
                   CASE WHEN coalesce(t.n_distinct_grams, 0) > 0
                        THEN round(CAST(coalesce(m.leaked_grams, 0) AS DOUBLE)
                                   / t.n_distinct_grams, 6)
                        ELSE 0.0 END AS leaked_frac,
                   coalesce(m.leaking_docs, 0) >= 1 AS leaked,
                   w.worst_doc,
                   CAST(coalesce(w.worst_doc_shared, 0) AS BIGINT)
                     AS worst_doc_shared
            FROM items i LEFT JOIN tot t USING (bid)
                         LEFT JOIN m USING (bid)
                         LEFT JOIN worst w USING (bid)
        """,
        # Cross-benchmark overlap matrix (r14): four synthetic eval
        # sets (every 5th doc, doc_id % 4), pairwise distinct-8-gram
        # containment + Jaccard via the identical digest pipeline.
        "benchmark_overlap_matrix": r"""
            WITH words AS MATERIALIZED (
              SELECT (doc_id % 4) AS s,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents WHERE doc_id % 5 = 0),
            g AS MATERIALIZED (
              SELECT DISTINCT s,
                     ('0x' || substr(md5(gr), 1, 15))::BIGINT AS d
              FROM (SELECT s,
                           unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS gr
                    FROM words WHERE len(w) >= 8)),
            sizes AS (SELECT s, count(*) AS n FROM g GROUP BY s),
            sets AS (SELECT DISTINCT (doc_id % 4) AS s FROM documents
                     WHERE doc_id % 5 = 0),
            shared AS (
              SELECT a.s AS sa, b.s AS sb, count(*) AS sh
              FROM g a JOIN g b USING (d)
              WHERE a.s <> b.s GROUP BY a.s, b.s),
            p AS (SELECT x.s AS sa, y.s AS sb
                  FROM sets x, sets y WHERE x.s <> y.s)
            SELECT p.sa AS set_a, p.sb AS set_b,
                   CAST(coalesce(na.n, 0) AS BIGINT) AS grams_a,
                   CAST(coalesce(nb.n, 0) AS BIGINT) AS grams_b,
                   CAST(coalesce(sh.sh, 0) AS BIGINT) AS shared_grams,
                   CASE WHEN coalesce(na.n, 0) > 0
                        THEN round(CAST(coalesce(sh.sh, 0) AS DOUBLE)
                                   / na.n, 6)
                        ELSE 0.0 END AS containment,
                   CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0)
                             - coalesce(sh.sh, 0) > 0
                        THEN round(CAST(coalesce(sh.sh, 0) AS DOUBLE)
                                   / (coalesce(na.n, 0) + coalesce(nb.n, 0)
                                      - coalesce(sh.sh, 0)), 6)
                        ELSE 0.0 END AS jaccard
            FROM p LEFT JOIN sizes na ON na.s = p.sa
                   LEFT JOIN sizes nb ON nb.s = p.sb
                   LEFT JOIN shared sh ON sh.sa = p.sa AND sh.sb = p.sb
        """,
        # Per-span leak attribution (r14): leaked 8-gram positions
        # per (bench item, corpus doc), gaps-and-islands merged in the
        # corpus doc's token coordinates — the forensic join of the
        # leak report back to training-text spans.
        "benchmark_leak_spans": r"""
            WITH words AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            bg AS (
              SELECT DISTINCT doc_id AS bid,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT AS d
              FROM (SELECT doc_id,
                           unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS g
                    FROM words WHERE doc_id % 50 = 0 AND len(w) >= 8)),
            g AS (
              SELECT doc_id AS cid,
                     unnest([{'p': i - 1,
                              'd': ('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT}
                             for i in generate_series(1, len(w) - 7)]) AS u
              FROM words WHERE len(w) >= 8),
            e AS (SELECT cid, u.p AS p, u.d AS d FROM g),
            dp AS (SELECT bg.bid, e.cid, e.p FROM e JOIN bg USING (d)),
            m AS (SELECT bid, cid, p,
                         CASE WHEN p - lag(p) OVER (PARTITION BY bid, cid
                                                    ORDER BY p) > 8
                              THEN 1 ELSE 0 END AS b
                  FROM dp),
            i AS (SELECT bid, cid, p,
                         sum(b) OVER (PARTITION BY bid, cid ORDER BY p) AS isl
                  FROM m)
            SELECT bid AS bench_id, cid AS doc_id,
                   CAST(min(p) AS BIGINT) AS span_start,
                   CAST(max(p) + 7 AS BIGINT) AS span_end,
                   CAST(max(p) + 7 - min(p) + 1 AS BIGINT) AS span_tokens
            FROM i GROUP BY bid, cid, isl
        """,
        # Suite-level per-span leak attribution (r16): the
        # benchmark_leak_spans island pipeline with the 4-set suite
        # (every 5th doc, doc_id % 4) — the item's set label rides
        # the (item, doc) island key.
        "multi_benchmark_leak_spans": r"""
            WITH words AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            bg AS (
              SELECT DISTINCT doc_id AS bid, (doc_id % 4) AS st,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT AS d
              FROM (SELECT doc_id,
                           unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS g
                    FROM words WHERE doc_id % 5 = 0 AND len(w) >= 8)),
            g AS (
              SELECT doc_id AS cid,
                     unnest([{'p': i - 1,
                              'd': ('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT}
                             for i in generate_series(1, len(w) - 7)]) AS u
              FROM words WHERE len(w) >= 8),
            e AS (SELECT cid, u.p AS p, u.d AS d FROM g),
            dp AS (SELECT bg.bid, bg.st, e.cid, e.p
                   FROM e JOIN bg USING (d)),
            m AS (SELECT bid, st, cid, p,
                         CASE WHEN p - lag(p) OVER (PARTITION BY bid, cid
                                                    ORDER BY p) > 8
                              THEN 1 ELSE 0 END AS b
                  FROM dp),
            i AS (SELECT bid, st, cid, p,
                         sum(b) OVER (PARTITION BY bid, cid ORDER BY p) AS isl
                  FROM m)
            SELECT bid AS bench_id, st AS bench_set, cid AS doc_id,
                   CAST(min(p) AS BIGINT) AS span_start,
                   CAST(max(p) + 7 AS BIGINT) AS span_end,
                   CAST(max(p) + 7 - min(p) + 1 AS BIGINT) AS span_tokens
            FROM i GROUP BY bid, st, cid, isl
        """,
        # Decontamination surgery: the exactsubstr bench-digest
        # pipeline + the repeated_span_cut island-merge/cut chain —
        # leaked 8-gram positions merge into maximal spans (gap > 8
        # breaks), covered tokens are cut from the normalized stream.
        # words is 4-way referenced -> MATERIALIZED (DuckDB inlines
        # CTEs otherwise).
        "decontaminate_cut": r"""
            WITH words AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            bd AS (
              SELECT DISTINCT
                     ('0x' || substr(md5(g), 1, 15))::BIGINT AS d
              FROM (SELECT unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS g
                    FROM words WHERE doc_id % 50 = 0 AND len(w) >= 8)),
            g AS (
              SELECT doc_id,
                     unnest([{'p': i - 1,
                              'd': ('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT}
                             for i in generate_series(1, len(w) - 7)]) AS u
              FROM words WHERE len(w) >= 8),
            e AS (SELECT doc_id, u.p AS p, u.d AS d FROM g),
            dp AS (SELECT doc_id, p FROM e JOIN bd USING (d)),
            m AS (SELECT doc_id, p,
                         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                                                    ORDER BY p) > 8
                              THEN 1 ELSE 0 END AS b
                  FROM dp),
            isl AS (SELECT doc_id, p,
                           sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS i2
                    FROM m),
            spans AS (SELECT doc_id, min(p) AS s, max(p) + 7 AS e2
                      FROM isl GROUP BY doc_id, i2),
            tok AS (
              SELECT doc_id,
                     unnest([{'i': i - 1, 't': w[i]}
                             for i in generate_series(1, len(w))]) AS u
              FROM words),
            tk AS (SELECT doc_id, u.i AS i, u.t AS t FROM tok),
            kept AS (
              SELECT t.doc_id, t.i, t.t
              FROM tk t LEFT JOIN spans s
                ON s.doc_id = t.doc_id AND t.i BETWEEN s.s AND s.e2
              WHERE s.doc_id IS NULL),
            agg AS (SELECT doc_id, count(*) AS kept_n,
                           string_agg(t, ' ' ORDER BY i) AS ct
                    FROM kept GROUP BY doc_id)
            SELECT w.doc_id,
                   CAST(len(w.w) AS BIGINT) AS n_tokens,
                   CAST(len(w.w) - coalesce(a.kept_n, 0) AS BIGINT)
                     AS removed_tokens,
                   coalesce(a.ct, '') AS clean_text
            FROM words w LEFT JOIN agg a USING (doc_id)
        """,
        # Suite-level decontamination surgery (r15): the
        # decontaminate_cut pipeline with the digest table widened to
        # (set, digest) over four eval sets (every 5th doc, doc_id % 4
        # — the overlap-matrix suite), spans cut against the UNION of
        # distinct matched positions, plus per-set attribution
        # ("set=hits" pairs, comma-joined, sorted by the set id's
        # VARCHAR form to mirror Spark's array_sort on the stringified
        # set column).
        "multi_benchmark_decontaminate": r"""
            WITH words AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            bg AS MATERIALIZED (
              SELECT DISTINCT CAST(doc_id % 4 AS VARCHAR) AS st,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT AS d
              FROM (SELECT doc_id,
                           unnest([array_to_string(w[i:i+7], ' ')
                                   for i in generate_series(1, len(w) - 7)]) AS g
                    FROM words WHERE doc_id % 5 = 0 AND len(w) >= 8)),
            g AS (
              SELECT doc_id,
                     unnest([{'p': i - 1,
                              'd': ('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))::BIGINT}
                             for i in generate_series(1, len(w) - 7)]) AS u
              FROM words WHERE len(w) >= 8),
            e AS (SELECT doc_id, u.p AS p, u.d AS d FROM g),
            m0 AS (SELECT e.doc_id, e.p, bg.st FROM e JOIN bg USING (d)),
            dp AS (SELECT DISTINCT doc_id, p FROM m0),
            m AS (SELECT doc_id, p,
                         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                                                    ORDER BY p) > 8
                              THEN 1 ELSE 0 END AS b
                  FROM dp),
            isl AS (SELECT doc_id, p,
                           sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS i2
                    FROM m),
            spans AS (SELECT doc_id, min(p) AS s2, max(p) + 7 AS e2
                      FROM isl GROUP BY doc_id, i2),
            tok AS (
              SELECT doc_id,
                     unnest([{'i': i - 1, 't': w[i]}
                             for i in generate_series(1, len(w))]) AS u
              FROM words),
            tk AS (SELECT doc_id, u.i AS i, u.t AS t FROM tok),
            kept AS (
              SELECT t.doc_id, t.i, t.t
              FROM tk t LEFT JOIN spans s
                ON s.doc_id = t.doc_id AND t.i BETWEEN s.s2 AND s.e2
              WHERE s.doc_id IS NULL),
            agg AS (SELECT doc_id, count(*) AS kept_n,
                           string_agg(t, ' ' ORDER BY i) AS ct
                    FROM kept GROUP BY doc_id),
            hits AS (SELECT doc_id, st, count(*) AS h
                     FROM m0 GROUP BY doc_id, st),
            attr AS (SELECT doc_id,
                            count(*) AS n_leak_sets,
                            string_agg(st || '=' || CAST(h AS VARCHAR),
                                       ',' ORDER BY st) AS leak_attribution
                     FROM hits GROUP BY doc_id)
            SELECT w.doc_id,
                   CAST(len(w.w) AS BIGINT) AS n_tokens,
                   CAST(len(w.w) - coalesce(a.kept_n, 0) AS BIGINT)
                     AS removed_tokens,
                   coalesce(a.ct, '') AS clean_text,
                   CAST(coalesce(at2.n_leak_sets, 0) AS BIGINT)
                     AS n_leak_sets,
                   coalesce(at2.leak_attribution, '') AS leak_attribution
            FROM words w LEFT JOIN agg a USING (doc_id)
                         LEFT JOIN attr at2 USING (doc_id)
        """,
        "dedup_fillscore": """
            WITH ranked AS (
              SELECT lang, source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang, source
                                        ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents)
            SELECT lang, source, doc_id, n_chars FROM ranked WHERE rn = 1
        """,
        "lang_id": f"""
            WITH scored AS (
              SELECT doc_id, lang,
                     {lang_hits['de']} AS h_de,
                     {lang_hits['en']} AS h_en,
                     {lang_hits['es']} AS h_es,
                     {lang_hits['fr']} AS h_fr
              FROM documents)
            SELECT doc_id, lang,
                   CASE WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= 1
                          THEN 'de'
                        WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= 1 THEN 'en'
                        WHEN h_es >= h_fr AND h_es >= 1 THEN 'es'
                        WHEN h_fr >= 1 THEN 'fr'
                        ELSE 'und' END AS pred_lang
            FROM scored
        """,
        "token_count": """
            SELECT doc_id,
                   len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                     AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                     AS regex_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH feats AS (
              SELECT doc_id,
                     length(text) AS q_chars,
                     len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                       AS q_words,
                     len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
                     len(list_filter(list_filter(string_split(lower(text), ' '),
                                                 x -> x <> ''),
                                     x -> list_contains([{en}], x))) AS n_stop
              FROM documents)
            SELECT doc_id, q_chars, q_words,
                   round(CASE WHEN q_chars > 0
                              THEN n_punct / CAST(q_chars AS DOUBLE) ELSE 0 END, 6)
                     AS q_punct_ratio,
                   round(CASE WHEN q_words > 0
                              THEN n_stop / CAST(q_words AS DOUBLE) ELSE 0 END, 6)
                     AS q_stop_ratio,
                   round(least(q_words / 100.0, 1.0) * 0.4
                         + greatest(0.0, 1.0 - (CASE WHEN q_chars > 0
                              THEN n_punct / CAST(q_chars AS DOUBLE) ELSE 0 END) * 5) * 0.3
                         + least((CASE WHEN q_words > 0
                              THEN n_stop / CAST(q_words AS DOUBLE) ELSE 0 END) * 5,
                              1.0) * 0.3, 6) AS q_score
            FROM feats
        """,
        "multimodal_features": """
            WITH hx AS (
              SELECT doc_id AS media_id,
                     CASE WHEN doc_id % 3 = 0 THEN 'image'
                          WHEN doc_id % 3 = 1 THEN 'audio'
                          ELSE 'video' END AS kind,
                     octet_length(CAST(text AS BLOB)) AS n_bytes,
                     sha256(text) AS digest
              FROM documents),
            b AS (
              SELECT *,
                     (instr('0123456789abcdef', substr(digest, 1, 1)) - 1) * 16
                       + (instr('0123456789abcdef', substr(digest, 2, 1)) - 1) AS d0,
                     (instr('0123456789abcdef', substr(digest, 3, 1)) - 1) * 16
                       + (instr('0123456789abcdef', substr(digest, 4, 1)) - 1) AS d1,
                     (instr('0123456789abcdef', substr(digest, 5, 1)) - 1) * 16
                       + (instr('0123456789abcdef', substr(digest, 6, 1)) - 1) AS d2
              FROM hx)
            SELECT media_id, kind, CAST(n_bytes AS INT) AS n_bytes, digest,
                   CASE WHEN kind = 'image' THEN CAST(64 + d0 % 192 AS INT) END AS width,
                   CASE WHEN kind = 'image' THEN CAST(64 + d1 % 192 AS INT) END AS height,
                   CASE WHEN kind = 'audio' THEN round(0.5 + d2 / 16.0, 4) END
                     AS duration_s,
                   kind = 'video' AS has_error
            FROM b
        """,
        # resize contract: images -> max(1, (224*224) div 256) = 196
        # stub bytes at the target dims; other kinds pass through.
        "multimodal_resize": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 196
                             ELSE octet_length(CAST(text AS BLOB)) END AS INT)
                     AS out_bytes,
                   CASE WHEN doc_id % 3 = 0 THEN CAST(224 AS INT) END AS width,
                   CASE WHEN doc_id % 3 = 0 THEN CAST(224 AS INT) END AS height,
                   FALSE AS has_error
            FROM documents
        """,
        "sessionize": """
            WITH gaps AS (
              SELECT event_id, user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR CAST(floor(epoch(ts)) AS BIGINT)
                               - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                          THEN 1 ELSE 0 END AS is_new,
                     ts
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
            SELECT event_id, user_id,
                   CAST(sum(is_new) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS session_id
            FROM gaps
        """,
        # Streaming sessionize closed-session set: sessionize with the
        # streaming operator's MICROSECOND gap math, group to sessions,
        # keep non-final sessions (in-data close) plus final sessions
        # the event-time timeout fired for. Spark fires a timeout when
        # the ms-truncated watermark (max event time ms - delay) moves
        # strictly past the ms-truncated timeout timestamp (end + gap).
        "streaming_sessions": """
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
            numbered AS (
              SELECT user_id, ts,
                     CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS sid
              FROM gaps),
            sess AS (
              SELECT user_id, sid,
                     min(ts) AS session_start, max(ts) AS session_end,
                     count(*) AS n_events,
                     max(sid) OVER (PARTITION BY user_id) AS last_sid
              FROM numbered GROUP BY user_id, sid),
            m AS (SELECT max(ts) AS mx FROM events)
            SELECT user_id,
                   strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
                   n_events
            FROM sess, m
            WHERE sid < last_sid
               OR (epoch_us(mx) // 1000) - 1800000
                  > (epoch_us(session_end) + 1800000000) // 1000
        """,
        # Native session_window semantics: break at gap > 30 min
        # (two events exactly gap apart MERGE — the window boundary is
        # closed, verified by test_split_rebalance.py), emit iff
        # end + 2*gap <= max(ts) (append mode waits for the watermark
        # to pass the session end; final watermark = max(ts) - gap).
        "streaming_sessions_native": """
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
            numbered AS (
              SELECT user_id, ts,
                     CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS sid
              FROM gaps),
            sess AS (
              SELECT user_id,
                     min(ts) AS session_start, max(ts) AS session_end,
                     count(*) AS n_events
              FROM numbered GROUP BY user_id, sid),
            m AS (SELECT max(ts) AS mx FROM events)
            SELECT user_id,
                   strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
                   n_events
            FROM sess, m
            WHERE epoch_us(session_end) + 3600000000 <= epoch_us(mx)
        """,
        "split_assign": """
            SELECT doc_id,
                   CASE WHEN b < 980 THEN 'train'
                        WHEN b < 990 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                     1, 8))::BIGINT % 1000 AS b
              FROM documents)
        """,
        # priority = weight / u with u an md5-derived 31-bit uniform;
        # one IEEE division is correctly rounded, so the top-n set is
        # bit-identical to the Spark side.
        "priority_sample": """
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     CAST(n_chars AS DOUBLE) /
                       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          ::BIGINT % 2147483648 + 1) AS pri
              FROM documents)
            ORDER BY pri DESC, doc_id ASC LIMIT 100
        """,
        "domain_rebalance": """
            WITH c AS (
              SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
            SELECT e.event_type, count(*) AS n_kept
            FROM events e JOIN c USING (event_type)
            WHERE c.n <= 1000
               OR (('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
                     ::BIGINT / 4294967296.0) * c.n < 1000
            GROUP BY e.event_type
        """,
        "windowed_counts": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n, round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "graph_neighbors": """
            SELECT 'R0' AS rid, 0 AS hop
            UNION ALL
            SELECT 'N' || n_nationkey, 1 FROM nation WHERE n_regionkey = 0
            UNION ALL
            SELECT 'C' || c_custkey, 2 FROM customer c
            WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey
                          AND n.n_regionkey = 0)
        """,
        "asof_join": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 r AS (SELECT user_id, ts, event_id, value FROM events
                       WHERE event_type = 'purchase')
            SELECT l.event_id, l.user_id,
                   r.ts AS asof_time,
                   r.event_id AS asof_event_id,
                   round(r.value, 6) AS asof_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join": """
            SELECT c.c_nationkey AS nationkey, c.c_custkey, s.s_suppkey,
                   round(greatest(least(c.c_acctbal + 500, s.s_acctbal + 500)
                                  - greatest(c.c_acctbal, s.s_acctbal), 0), 6)
                       AS overlap
            FROM customer c JOIN supplier s
              ON c.c_nationkey = s.s_nationkey
             AND c.c_acctbal <= s.s_acctbal + 500
             AND s.s_acctbal <= c.c_acctbal + 500
        """,
        "approx_distinct": """
            SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct,
                   TRUE AS hll_ok
            FROM lineitem GROUP BY l_returnflag
        """,
        "approx_quantiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS exact_p5,
                   TRUE AS ok_p5,
                   round(quantile_cont(value, 0.95), 6) AS exact_p95,
                   TRUE AS ok_p95
            FROM events GROUP BY event_type
        """,
        # cosine_topk with the cross-label constraint.
        "hard_negatives": """
            WITH q AS (SELECT vec_id AS query_id, label AS query_label,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
                     e.label AS neighbor_label,
                     list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM embeddings e, q
              WHERE e.vec_id <> q.query_id AND e.label <> q.query_label),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, query_label, neighbor_id, neighbor_label,
                   round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        # Decimal-exact per-dimension moments (summation-order-proof).
        "embedding_dim_stats": """
            WITH x AS (
              SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
              FROM embeddings, generate_series(1, 64) g(i)),
            st AS (
              SELECT dim,
                     CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE)
                       / count(*) AS mu,
                     CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE)
                       / count(*) AS ex2,
                     round(min(x), 6) AS min, round(max(x), 6) AS max
              FROM x GROUP BY dim)
            SELECT CAST(dim AS INT) AS dim, round(mu, 6) AS mean,
                   round(sqrt(ex2 - mu * mu), 6) AS std, min, max
            FROM st
        """,
        # semantic_decontaminate (r17): the threshold compares the
        # UNROUNDED double on both engines; the per-doc argmax
        # tie-breaks to the lowest eval_id, mirroring the Spark
        # max(struct(cos, -eval_id)) order.
        "semantic_decontaminate": """
            WITH q AS (SELECT vec_id AS eval_id,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id % 40 = 0),
            c AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings WHERE vec_id % 40 <> 0),
            scored AS (
              SELECT doc_id, eval_id,
                     list_cosine_similarity(cv, qv) AS sim
              FROM c, q),
            ranked AS (
              SELECT doc_id, eval_id, sim,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY sim DESC, eval_id ASC) AS rn
              FROM scored)
            SELECT doc_id, eval_id AS nearest_eval_id,
                   round(sim, 4) AS max_cos, sim >= 0.3 AS contaminated
            FROM ranked WHERE rn = 1
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM embeddings e, q WHERE e.vec_id <> q.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        # Full replication of the seeded-md5 MinHash+LSH pipeline:
        # signatures, banding, candidate join, exact-Jaccard verify —
        # proves banding soundness, not just the verified pairs.
        # One md5 digest per shingle folded to 60 bits mod 2^31-1, then
        # the 32 affine family minima (a_i*h + b_i mod p) — identical
        # integers to md5_shingle_hashes + the affine MinHash family.
        # Exact integer Gram over the identical int8 quantization.
        "gram_matrix": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
              FROM embeddings),
            sc AS (
              SELECT vec_id, xs,
                     greatest(list_max(list_transform(xs, x -> abs(x))), 1e-12)
                       / 127.0 AS scale
              FROM v),
            q AS (
              SELECT vec_id,
                     list_transform(xs, x -> CAST(round(x / scale) AS BIGINT)) AS qv
              FROM sc),
            ij AS (
              SELECT a.i AS i, b.j AS j
              FROM generate_series(0, 63) a(i), generate_series(0, 63) b(j)
              WHERE a.i <= b.j)
            SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
                   CAST(sum(qv[i + 1] * qv[j + 1]) AS BIGINT) AS s
            FROM q, ij GROUP BY i, j
        """,
        # Weighted fair queueing order: md5 per-source rank / weight.
        "mixture_interleave": """
            WITH r AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS r
              FROM documents),
            v AS (
              SELECT doc_id, source,
                     round(r / CASE WHEN source IN ('src0', 'src1')
                                    THEN 4.0 ELSE 1.0 END, 6) AS vtime
              FROM r),
            o AS (
              SELECT doc_id, source, vtime,
                     CAST(row_number() OVER (ORDER BY vtime ASC, source ASC,
                                             doc_id ASC) AS INT) AS position
              FROM v)
            SELECT position, doc_id, source, vtime FROM o WHERE position <= 200
        """,
        # SCD2: lag change-detect then lead validity; tie-break on the
        # attribute keeps the order total.
        "scd2": """
            WITH chg AS (
              SELECT user_id, event_type, ts,
                     lag(ts) OVER w IS NULL
                       OR event_type IS DISTINCT FROM lag(event_type) OVER w
                       AS keep
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_type ASC)),
            log AS (SELECT user_id, event_type, ts FROM chg WHERE keep)
            SELECT user_id, event_type,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
                   strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
                   lead(ts) OVER w2 IS NULL AS is_current
            FROM log
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, event_type ASC)
        """,
        # KMV sketch: md5-uniform hashes, k smallest distinct per
        # group, (k-1)/u_k — bit-identical across engines.
        "kmv_distinct": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u
              FROM events),
            rk AS (
              SELECT event_type, u,
                     row_number() OVER (PARTITION BY event_type ORDER BY u ASC) AS r
              FROM h)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                              ELSE 63.0 / greatest(max(u), 1e-12) END, 4) AS est_distinct
            FROM rk WHERE r <= 64 GROUP BY event_type
        """,
        "kmv_distinct_merged": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u
              FROM events),
            rk AS (
              SELECT event_type, u,
                     row_number() OVER (PARTITION BY event_type ORDER BY u ASC) AS r
              FROM h)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                              ELSE 63.0 / greatest(max(u), 1e-12) END, 4) AS est_distinct
            FROM rk WHERE r <= 64 GROUP BY event_type
        """,
        # Degree-ordered wedge enumeration; every triangle credited to
        # its three corners exactly once.
        "triangle_count": """
            WITH e0 AS (
              SELECT DISTINCT
                     least(l_orderkey % 20000, (l_partkey * 3) % 20000) AS u,
                     greatest(l_orderkey % 20000, (l_partkey * 3) % 20000) AS v
              FROM lineitem
              WHERE l_orderkey % 20000 <> (l_partkey * 3) % 20000),
            w AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                  FROM e0 e1 JOIN e0 e2 ON e1.v = e2.u),
            t AS (SELECT a, b, c FROM w JOIN e0 e3 ON e3.u = w.a AND e3.v = w.c),
            x AS (SELECT unnest([a, b, c]) AS node FROM t)
            SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
            FROM x GROUP BY node
        """,
        # Cross-corpus near-dup flag: corpus (outside src0-4) banded
        # against the reference (src0-4); verify on hashed shingle sets.
        "dedup_against": f"""
            WITH {_mh_side_ctes("c_", "WHERE source NOT IN ('src0','src1','src2','src3','src4')").lstrip()},
            {_mh_side_ctes("r_", "WHERE source IN ('src0','src1','src2','src3','src4')").lstrip()},
            cand AS (
              SELECT DISTINCT c.doc_id AS id, r.doc_id AS rid
              FROM c_bands c JOIN r_bands r ON c.b = r.b AND c.bhash = r.bhash),
            ver AS (
              SELECT id, rid,
                     CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.hs, b.hs))) AS j
              FROM cand JOIN c_hset a ON a.doc_id = id
                        JOIN r_hset b ON b.doc_id = rid)
            SELECT id AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_ref_matches,
                   round(max(j), 4) AS best_jaccard
            FROM ver WHERE j >= 0.6 GROUP BY id
        """,
        # Leakage audit: minhash near-dup pairs straddling the 50/50
        # md5 split (split is a pure function of the id, no join).
        "split_leakage": f"""
            WITH {_mh_side_ctes("", "").lstrip()},
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM bands x JOIN bands y
                ON x.b = y.b AND x.bhash = y.bhash AND x.doc_id < y.doc_id),
            jac AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.hs, b.hs))) AS j
              FROM cand JOIN hset a ON a.doc_id = id_a
                        JOIN hset b ON b.doc_id = id_b),
            sp AS (
              SELECT id_a, id_b, round(j, 4) AS jaccard,
                     CASE WHEN ('0x' || substr(md5('split:' || CAST(id_a AS VARCHAR)),
                                1, 8))::BIGINT % 2 < 1 THEN 'train' ELSE 'val' END AS split_a,
                     CASE WHEN ('0x' || substr(md5('split:' || CAST(id_b AS VARCHAR)),
                                1, 8))::BIGINT % 2 < 1 THEN 'train' ELSE 'val' END AS split_b
              FROM jac WHERE j >= 0.6)
            SELECT * FROM sp WHERE split_a <> split_b
        """,
        # CCNet boilerplate: injected per-source 8-word banner must be
        # stripped (docs_with >= 2 AND > half the source's docs).
        "boilerplate_strip": """
            WITH docs AS (
              SELECT doc_id, source,
                     'visit ' || source || ' home page for great content today '
                       || text AS text
              FROM documents),
            base AS (
              SELECT doc_id, source, string_split(text, ' ') AS w
              FROM docs WHERE length(text) > 0),
            b2 AS (
              SELECT doc_id, source, w, ((len(w) - 1) // 8) + 1 AS n_seg FROM base),
            segs AS (
              SELECT doc_id, source, w, unnest(range(0, n_seg)) AS seg_idx FROM b2),
            st AS (
              SELECT doc_id, source, seg_idx,
                     array_to_string(
                       w[CAST(seg_idx * 8 + 1 AS INT):CAST(seg_idx * 8 + 8 AS INT)],
                       ' ') AS seg_text
              FROM segs),
            srcd AS (SELECT source, count(*) AS src_docs FROM docs GROUP BY source),
            dfc AS (SELECT source, seg_text, count(DISTINCT doc_id) AS docs_with
                    FROM st GROUP BY 1, 2),
            boiler AS (
              SELECT d.source, d.seg_text, TRUE AS is_boiler
              FROM dfc d JOIN srcd s ON s.source = d.source
              WHERE docs_with >= 2 AND docs_with > 0.5 * src_docs)
            SELECT st.doc_id, st.source,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(coalesce(sum(CASE WHEN is_boiler IS NULL THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS kept_segments,
                   coalesce(string_agg(CASE WHEN is_boiler IS NULL THEN st.seg_text END,
                                       ' ' ORDER BY seg_idx), '') AS clean_text
            FROM st LEFT JOIN boiler b
              ON b.source = st.source AND b.seg_text = st.seg_text
            GROUP BY st.doc_id, st.source
        """,
        # Church-Hanks PMI over adjacent bigrams, top-40 by
        # (pmi desc, w1, w2) with min count 5.
        "pmi_collocations": """
            WITH w AS (
              SELECT string_split(text, ' ') AS w
              FROM documents WHERE length(text) > 0),
            b AS (
              SELECT unnest([{'w1': w[i], 'w2': w[i+1]}
                             for i in generate_series(1, len(w) - 1)]) AS s
              FROM w WHERE len(w) >= 2),
            big AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n FROM b GROUP BY 1, 2),
            u AS (SELECT tok, count(*) AS n_tok
                  FROM (SELECT unnest(w) AS tok FROM w) GROUP BY tok),
            tu AS (SELECT sum(n_tok) AS t_uni FROM u),
            tb AS (SELECT sum(n) AS t_big FROM big)
            SELECT w1, w2, n,
                   round(log2((CAST(n AS DOUBLE) / t_big)
                              / ((CAST(a.n_tok AS DOUBLE) / t_uni)
                                 * (CAST(c.n_tok AS DOUBLE) / t_uni))), 6) AS pmi
            FROM big JOIN u a ON a.tok = big.w1
                     JOIN u c ON c.tok = big.w2, tu, tb
            WHERE n >= 5
            ORDER BY pmi DESC, w1, w2 LIMIT 40
        """,
        # Gopher rule flags: every signal is list algebra over the
        # single-space word split; flags compare the ROUNDED values.
        "gopher_quality": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE length(text) > 0),
            c AS (
              SELECT doc_id,
                     CAST(len(w) AS BIGINT) AS n_words,
                     round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
                           / len(w), 6) AS mean_word_len,
                     round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
                       AS dup_frac,
                     CAST(len(list_filter(w,
                             x -> list_contains(['a','the','and','of','to','in'], x)))
                          AS BIGINT) AS n_stop,
                     round(CAST(len(list_filter(w,
                             x -> list_contains(['a','the','and','of','to','in'], x)))
                           AS DOUBLE) / len(w), 6) AS stop_frac
              FROM w)
            SELECT doc_id, n_words, mean_word_len, dup_frac, stop_frac,
                   (n_words >= 20 AND n_words <= 100000) AS ok_words,
                   (mean_word_len >= 3.0 AND mean_word_len <= 7.0) AS ok_word_len,
                   (dup_frac <= 0.65) AS ok_dup,
                   (n_stop >= 2) AS ok_stop,
                   ((n_words >= 20 AND n_words <= 100000)
                    AND (mean_word_len >= 3.0 AND mean_word_len <= 7.0)
                    AND dup_frac <= 0.65 AND n_stop >= 2) AS passes
            FROM c
        """,
        # Per-group winsorization at p05/p95 (quantile_cont ==
        # Spark percentile; parity pinned by grouped_percentiles).
        "winsorize": """
            WITH stats AS (
              SELECT event_type,
                     quantile_cont(value, 0.05) AS lo,
                     quantile_cont(value, 0.95) AS hi
              FROM events GROUP BY event_type)
            SELECT event_id, e.event_type,
                   round(least(greatest(value, lo), hi), 6) AS value_w,
                   (value < lo) AS clipped_low,
                   (value > hi) AS clipped_high
            FROM events e JOIN stats s ON s.event_type = e.event_type
        """,
        "minhash_lsh": rf"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
            hx AS (
              SELECT doc_id,
                     ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h
              FROM ex),
            params(i, a, b) AS (VALUES {', '.join(f'({i}, {a}, {b})' for i, (a, b) in enumerate(_mh_params(32)))}),
            mh AS (
              SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
              FROM hx, params
              GROUP BY doc_id, i),
            sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, b,
                     md5(array_to_string(list_slice(sig, b*2 + 1, b*2 + 2), ',')) AS bhash
              FROM sig, generate_series(0, 15) g(b)),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM bands x JOIN bands y
                ON x.b = y.b AND x.bhash = y.bhash AND x.doc_id < y.doc_id),
            hset AS (
              SELECT doc_id, list_distinct(list(h)) AS hs FROM hx GROUP BY doc_id),
            jac AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.hs, b.hs))) AS j
              FROM cand JOIN hset a ON a.doc_id = id_a JOIN hset b ON b.doc_id = id_b)
            SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac WHERE j >= 0.6
        """,
        # Identical md5-hex bit-vote SimHash signature + chunk blocking.
        "simhash": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS t FROM words),
            toks AS (SELECT doc_id, md5(t) AS hx FROM tok),
            votes AS (
              SELECT doc_id, j,
                     SUM(CASE WHEN CAST(floor((instr('0123456789abcdef',
                                substr(hx, CAST(floor(j/4) AS INT) + 1, 1)) - 1)
                                / pow(2, 3 - (j % 4))) AS INT) % 2 = 1
                              THEN 1 ELSE -1 END) AS v
              FROM toks, generate_series(0, 63) g(j)
              GROUP BY doc_id, j),
            chunks AS (
              SELECT doc_id, CAST(floor(j/16) AS INT) AS chunk,
                     CAST(SUM(CASE WHEN v > 0
                                   THEN CAST(pow(2, 15 - (j % 16)) AS BIGINT)
                                   ELSE 0 END) AS BIGINT) AS ckey
              FROM votes GROUP BY doc_id, CAST(floor(j/16) AS INT)),
            sig AS (SELECT doc_id, list(ckey ORDER BY chunk) AS cs
                    FROM chunks GROUP BY doc_id),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM chunks x JOIN chunks y
                ON x.chunk = y.chunk AND x.ckey = y.ckey AND x.doc_id < y.doc_id),
            ham AS (
              SELECT id_a, id_b,
                     bit_count(xor(a.cs[1], b.cs[1])) + bit_count(xor(a.cs[2], b.cs[2]))
                   + bit_count(xor(a.cs[3], b.cs[3])) + bit_count(xor(a.cs[4], b.cs[4]))
                       AS hamming
              FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b)
            SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
            FROM ham WHERE hamming <= 3
        """,
        # Deletion-neighborhood edit-distance join: identical derived
        # keys, {s} + one-char deletions, variant equi-join, levenshtein.
        "edit_distance_join": """
            WITH base AS (
              SELECT p_partkey AS pid,
                     substr(md5(CAST(p_partkey // 5 AS VARCHAR)), 1, 12) AS bk
              FROM part),
            keys AS (
              SELECT pid,
                     CASE WHEN pid % 5 = 0
                          THEN substr(bk, 1, 4) || 'z' || substr(bk, 6, 7)
                          ELSE bk END AS key
              FROM base),
            variants AS (
              SELECT pid, key, unnest(list_distinct(list_append(
                       [substr(key, 1, i - 1) || substr(key, i + 1, length(key))
                        for i in generate_series(1, length(key))],
                       key))) AS v
              FROM keys),
            cand AS (
              SELECT DISTINCT a.pid AS id_a, b.pid AS id_b, a.key AS ka, b.key AS kb
              FROM variants a JOIN variants b ON a.v = b.v AND a.pid < b.pid)
            SELECT id_a, id_b, CAST(levenshtein(ka, kb) AS INT) AS dist
            FROM cand WHERE levenshtein(ka, kb) <= 1
        """,
        # Replicates the 2-deletion neighborhood blocking (exactness of
        # the neighborhood itself is proven by the brute-force unit
        # test); an all-pairs oracle would hand DuckDB a quadratic plan
        # no engine would run at scale and skew any timing comparison.
        "edit_distance_join_k2": """
            WITH base AS (
              SELECT p_partkey AS pid,
                     substr(md5(CAST(p_partkey // 7 AS VARCHAR)), 1, 12) AS bk
              FROM part),
            keys AS (
              SELECT pid,
                     CASE WHEN pid % 7 = 0
                          THEN substr(bk, 1, 4) || 'z' || substr(bk, 6, 3)
                               || 'q' || substr(bk, 10, 3)
                          WHEN pid % 7 = 3
                          THEN substr(bk, 1, 4) || 'z' || substr(bk, 6, 7)
                          ELSE bk END AS key
              FROM base),
            uniq AS (SELECT DISTINCT key FROM keys),
            d1 AS (
              SELECT key, unnest(list_distinct(list_append(
                       [substr(key, 1, i - 1) || substr(key, i + 1, length(key))
                        for i in generate_series(1, length(key))],
                       key))) AS v1
              FROM uniq),
            d2 AS (
              SELECT key, unnest(list_distinct(list_append(
                       [substr(v1, 1, i - 1) || substr(v1, i + 1, length(v1))
                        for i in generate_series(1, length(v1))],
                       v1))) AS v
              FROM d1),
            variants AS (SELECT DISTINCT key, v FROM d2),
            spairs AS (
              SELECT DISTINCT a.key AS ka, b.key AS kb
              FROM variants a JOIN variants b ON a.v = b.v AND a.key < b.key),
            verified AS (
              SELECT ka, kb, CAST(levenshtein(ka, kb) AS INT) AS dist
              FROM spairs WHERE levenshtein(ka, kb) <= 2),
            cross_pairs AS (
              SELECT least(ia.pid, ib.pid) AS id_a,
                     greatest(ia.pid, ib.pid) AS id_b, v.dist
              FROM verified v
              JOIN keys ia ON ia.key = v.ka
              JOIN keys ib ON ib.key = v.kb),
            same_pairs AS (
              SELECT a.pid AS id_a, b.pid AS id_b, 0 AS dist
              FROM keys a JOIN keys b ON a.key = b.key AND a.pid < b.pid)
            SELECT id_a, id_b, dist FROM cross_pairs
            UNION ALL
            SELECT id_a, id_b, dist FROM same_pairs
        """,
        # Batch equivalent of the stream-stream interval join: inner
        # append-mode matches == the plain self-join with the same
        # user+time predicate.
        "stream_interval_join": """
            SELECT a.event_id AS l_event_id, b.event_id AS r_event_id,
                   a.user_id AS user_id,
                   strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS l_ts,
                   strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS r_ts,
                   round(b.value, 4) AS r_value
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts >= a.ts
             AND b.ts <= a.ts + INTERVAL 10 MINUTE
            WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        """,
        # Two unrolled Lloyd iterations, identical md5-seeded codebook;
        # centroid means rounded to 6 so distributed-sum order can't
        # flip an assignment. (x-y)*(x-y) matches Spark's zip_with.
        "kmeans_assign": """
            WITH v AS (
              SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
            c0 AS (
              SELECT row_number() OVER (ORDER BY h) - 1 AS cluster, ev AS c
              FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, ev
                    FROM v ORDER BY h LIMIT 8)),
            s1 AS (
              SELECT v.vec_id, v.ev, c0.cluster,
                     list_sum([ (v.ev[i] - c0.c[i]) * (v.ev[i] - c0.c[i])
                                for i in generate_series(1, 64) ]) AS d
              FROM v CROSS JOIN c0),
            a1 AS (
              SELECT vec_id, ev, cluster, d FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d, cluster) AS rn
                FROM s1) WHERE rn = 1),
            m1 AS (
              SELECT cluster, i, round(avg(ev[i]), 6) AS m
              FROM a1, generate_series(1, 64) t(i)
              GROUP BY cluster, i),
            ml AS (
              SELECT cluster, list(m ORDER BY i) AS c FROM m1 GROUP BY cluster),
            c1 AS (
              SELECT c0.cluster, coalesce(ml.c, c0.c) AS c
              FROM c0 LEFT JOIN ml ON c0.cluster = ml.cluster),
            s2 AS (
              SELECT v.vec_id, c1.cluster,
                     list_sum([ (v.ev[i] - c1.c[i]) * (v.ev[i] - c1.c[i])
                                for i in generate_series(1, 64) ]) AS d
              FROM v CROSS JOIN c1),
            a2 AS (
              SELECT vec_id, cluster, d FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d, cluster) AS rn
                FROM s2) WHERE rn = 1)
            SELECT vec_id, CAST(cluster AS INT) AS cluster,
                   round(d, 6) AS dist2
            FROM a2
        """,
        # Hashed-linear classifier: identical md5 feature hash + integer
        # milli-weight table; the weight sum stays exact (BIGINT) and
        # only the sigmoid — transcendental, no structural rounding
        # ties — is rounded. label = weight_sum >= 0, exact.
        "classifier_score": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS words
              FROM documents),
            scored AS (
              SELECT doc_id, len(words) AS n_tokens,
                     CAST(coalesce(list_sum([
                       ((('0x' || substr(md5('w' || CAST(
                             ('0x' || substr(md5(x), 1, 6))::BIGINT % 1024
                           AS VARCHAR)), 1, 6))::BIGINT % 2001) - 1000)
                       for x in words ]), 0) AS BIGINT) AS ws
              FROM w)
            SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                   ws AS weight_sum,
                   round(1.0 / (1.0 + exp(-(CASE WHEN n_tokens > 0
                                                 THEN ws / (1000.0 * n_tokens)
                                                 ELSE 0.0 END) * 10)), 6)
                     AS prob,
                   ws >= 0 AS label
            FROM scored
        """,
        # Cross-document duplicate 5-gram fraction; words/shingle CTEs
        # mirror the decontaminate oracle at n=5.
        "dup_ngram_frac": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+4], ' ')
                                              for i in generate_series(1, len(w) - 4)])
                     END AS s
              FROM words),
            ex AS (
              SELECT doc_id, len(s) AS n_shingles, unnest(s) AS shingle FROM sh),
            counts AS (
              SELECT shingle, count(*) AS docs FROM ex GROUP BY shingle)
            SELECT e.doc_id, CAST(e.n_shingles AS INT) AS n_shingles,
                   CAST(sum(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup,
                   round(CAST(sum(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END)
                              AS BIGINT) / e.n_shingles, 6) AS dup_frac
            FROM ex e JOIN counts c ON e.shingle = c.shingle
            GROUP BY e.doc_id, e.n_shingles
        """,
        # PII scrub: identical sequential replace (email -> ip -> phone)
        # with per-kind counts taken before each pass; patterns are the
        # PII_PATTERNS constants verbatim.
        "pii_redact": _pii_oracle_sql(),
        "bpe_train": _bpe_oracle_sql(),
        # sampled BPE training: same unrolled merge chain over the 300
        # documents with the lowest md5-prefix text digest (the Spark
        # side's deterministic uniform draw, engine-replicable)
        "bpe_train_sampled": _bpe_oracle_sql(
            source="(SELECT text FROM documents "
            "ORDER BY ('0x' || substr(md5(text), 1, 15))::BIGINT ASC, "
            "text ASC LIMIT 300)"
        ),
        "bpe_encode": _bpe_encode_oracle_sql(),
        "pagerank": _pagerank_oracle_sql(),
        # weight-as-repetition expansion: Spark's percentile(col, p,
        # freq) is defined as the percentile of the row repeated freq
        # times — replicate literally with generate_series.
        "weighted_percentiles": """
            WITH expanded AS (
              SELECT l_returnflag, l_extendedprice,
                     CAST(l_quantity AS INT) AS w
              FROM lineitem),
            rows_exp AS (
              SELECT l_returnflag, l_extendedprice
              FROM expanded, unnest(generate_series(1, w)))
            SELECT e.l_returnflag,
                   round(quantile_cont(r.l_extendedprice, 0.5), 6) AS wp50,
                   round(quantile_cont(r.l_extendedprice, 0.9), 6) AS wp90,
                   t.total_weight
            FROM rows_exp r
            JOIN (SELECT l_returnflag, CAST(sum(w) AS BIGINT)
                         AS total_weight
                  FROM expanded GROUP BY l_returnflag) t
              USING (l_returnflag)
            JOIN (SELECT DISTINCT l_returnflag FROM expanded) e
              USING (l_returnflag)
            GROUP BY e.l_returnflag, t.total_weight
        """,
        "equidepth_histogram": """
            WITH b AS (
              SELECT l_returnflag, l_extendedprice,
                     ntile(10) OVER (PARTITION BY l_returnflag
                                     ORDER BY l_extendedprice ASC,
                                              l_orderkey ASC,
                                              l_linenumber ASC) AS bucket
              FROM lineitem)
            SELECT l_returnflag, bucket, count(*) AS n,
                   round(min(l_extendedprice), 6) AS lo,
                   round(max(l_extendedprice), 6) AS hi
            FROM b GROUP BY l_returnflag, bucket
        """,
        # Same total order as the Spark window (ts, touches-first,
        # type); conversions look back at the preceding frame only.
        "attribution": """
            WITH ev2 AS (
              SELECT user_id, ts, event_type,
                     event_type IN ('click', 'view') AS is_touch
              FROM events
              WHERE event_type IN ('purchase', 'click', 'view')),
            marked AS (
              SELECT user_id, ts, event_type, is_touch,
                     last_value(CASE WHEN is_touch THEN ts END IGNORE NULLS)
                       OVER w AS lt_ts,
                     last_value(CASE WHEN is_touch THEN event_type END
                                IGNORE NULLS) OVER w AS lt_type
              FROM ev2
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts ASC, is_touch DESC, event_type ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING))
            SELECT CASE WHEN epoch_us(lt_ts) >= epoch_us(ts) - 72::BIGINT * 3600 * 1000000
                        THEN lt_type END AS attributed_touch,
                   count(*) AS n_conversions
            FROM marked WHERE NOT is_touch
            GROUP BY 1
        """,
        # Forward first_value assigns each touch its next conversion;
        # identical total order to the last-touch oracle.
        "linear_attribution": """
            WITH ev AS (
              SELECT user_id, ts, event_type,
                     event_type IN ('click', 'view') AS is_touch
              FROM events
              WHERE event_type IN ('purchase', 'click', 'view')),
            marked AS (
              SELECT user_id, ts, event_type, is_touch,
                     first_value(CASE WHEN NOT is_touch THEN ts END IGNORE NULLS)
                       OVER w AS cts,
                     first_value(CASE WHEN NOT is_touch THEN event_type END
                                 IGNORE NULLS) OVER w AS ctype
              FROM ev
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts ASC, is_touch DESC, event_type ASC
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
            t AS (
              SELECT * FROM marked
              WHERE is_touch AND cts IS NOT NULL
                AND epoch_us(ts) >= epoch_us(cts) - 72::BIGINT * 3600 * 1000000),
            n AS (
              SELECT user_id, cts, ctype, count(*) AS n_all
              FROM t GROUP BY 1, 2, 3)
            SELECT t.user_id, t.cts AS conversion_ts, t.ctype AS conversion_type,
                   t.event_type AS touch_type,
                   count(*) AS n_touches,
                   round(CAST(count(*) AS DOUBLE) / max(n.n_all), 6) AS credit
            FROM t JOIN n ON n.user_id = t.user_id AND n.cts = t.cts
                         AND n.ctype = t.ctype
            GROUP BY 1, 2, 3, 4
        """,
        # One aggregate scan; rule rows stacked via VALUES join.
        "expectations": """
            WITH agg AS (
              SELECT
                round(CAST(count(doc_id) AS DOUBLE) / count(*), 6) AS o0,
                round(CAST(count(DISTINCT doc_id) AS DOUBLE) / count(*), 6) AS o1,
                round(CAST(count(text) AS DOUBLE) / count(*), 6) AS o2,
                round(CAST(min(n_chars) AS DOUBLE), 6) AS o3,
                round(CAST(max(n_chars) AS DOUBLE), 6) AS o4,
                round(CAST(sum(CASE WHEN lang IN ('en','de','es','fr')
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(lang), 6) AS o5,
                round(avg(CAST(n_chars AS DOUBLE)), 6) AS o6
              FROM documents)
            SELECT r.rule_id, r.col AS "column", r.chk AS "check",
                   CASE r.rule_id WHEN 0 THEN o0 WHEN 1 THEN o1 WHEN 2 THEN o2
                        WHEN 3 THEN o3 WHEN 4 THEN o4 WHEN 5 THEN o5
                        ELSE o6 END AS observed,
                   CASE r.rule_id
                        WHEN 0 THEN o0 >= 1.0
                        WHEN 1 THEN o1 >= 1.0
                        WHEN 2 THEN o2 >= 0.99
                        WHEN 3 THEN o3 >= 1
                        WHEN 4 THEN o4 <= 10000
                        WHEN 5 THEN o5 >= 0.95
                        ELSE o6 >= 50 AND o6 <= 500 END AS passed
            FROM agg, (VALUES (0, 'doc_id', 'not_null'),
                              (1, 'doc_id', 'unique'),
                              (2, 'text', 'not_null'),
                              (3, 'n_chars', 'min'),
                              (4, 'n_chars', 'max'),
                              (5, 'lang', 'in_set'),
                              (6, 'n_chars', 'mean_between'))
                 r(rule_id, col, chk)
        """,
        # Contribute-explode: each (user, day) pair hits its 7 report
        # days; distinct then count.
        "rolling_distinct": """
            WITH c AS (
              SELECT DISTINCT user_id,
                     CAST(date_trunc('day', ts) AS DATE) + CAST(i AS INT) AS day
              FROM events, generate_series(0, 6) g(i))
            SELECT strftime(day, '%Y-%m-%d') AS day,
                   count(*) AS n_distinct
            FROM c GROUP BY day
        """,
        # Bipartite projection with the md5 per-actor degree cap.
        "cooccurrence": """
            WITH p AS (
              SELECT DISTINCT l_orderkey AS a, l_partkey % 500 AS i
              FROM lineitem),
            capped AS (
              SELECT a, i FROM (
                SELECT a, i,
                       row_number() OVER (PARTITION BY a
                         ORDER BY md5(CAST(i AS VARCHAR)) ASC, i ASC) AS rn
                FROM p)
              WHERE rn <= 50)
            SELECT x.i AS item_a, y.i AS item_b, count(*) AS n_shared
            FROM capped x JOIN capped y ON x.a = y.a AND x.i < y.i
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        # Complete-mode stream-static join == the batch plan.
        "stream_enrich": """
            SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S')
                     AS window_start,
                   c.c_mktsegment,
                   count(*) AS n,
                   round(sum(e.value), 4) AS total_value
            FROM events e JOIN customer c ON c.c_custkey = e.user_id
            GROUP BY 1, 2
        """,
        "kfold_assign": """
            SELECT fold, count(*) AS n,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM (
              SELECT doc_id,
                     CAST(('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)),
                           1, 8))::BIGINT % 5 AS INT) AS fold
              FROM documents)
            GROUP BY fold
        """,
        # Bin width only tunes the physical plan: the plain range join
        # is the oracle for ANY bin size, measured or fixed.
        "range_join_auto": """
            WITH l AS (
              SELECT p_partkey AS l_id,
                     (p_partkey * 7) % 10000 AS l_s,
                     (p_partkey * 7) % 10000 + (p_size % 20) + 1 AS l_e
              FROM part),
            r AS (
              SELECT s_suppkey AS r_id,
                     (s_suppkey * 13) % 10000 AS r_s,
                     (s_suppkey * 13) % 10000 + 15 AS r_e
              FROM supplier)
            SELECT l_id, r_id,
                   greatest(l_s, r_s) AS overlap_start,
                   least(l_e, r_e) AS overlap_end
            FROM l JOIN r ON l_s <= r_e AND r_s <= l_e
        """,
        "diversity_report": """
            WITH base AS (
              SELECT source, string_split(text, ' ') AS w
              FROM documents WHERE length(text) > 0),
            d AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(len(w)) AS BIGINT) AS n_tokens
              FROM base GROUP BY source),
            t AS (
              SELECT source, count(DISTINCT tok) AS distinct_tokens
              FROM (SELECT source, unnest(w) AS tok FROM base) GROUP BY source),
            shs AS (
              SELECT source,
                     unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                            ELSE [array_to_string(w[i:i+2], ' ')
                                  for i in generate_series(1, len(w) - 2)]
                            END) AS s
              FROM base),
            sh AS (
              SELECT source, count(*) AS n_shingles,
                     count(DISTINCT s) AS distinct_shingles
              FROM shs GROUP BY source)
            SELECT d.source, d.n_docs, d.n_tokens, t.distinct_tokens,
                   round(CAST(t.distinct_tokens AS DOUBLE) / d.n_tokens, 6) AS ttr,
                   sh.n_shingles, sh.distinct_shingles,
                   round(CAST(sh.distinct_shingles AS DOUBLE) / sh.n_shingles, 6)
                     AS distinct_shingle_frac
            FROM d JOIN t ON t.source = d.source JOIN sh ON sh.source = d.source
        """,
        # Same quantization CTE as gram_matrix; exact integer dots.
        "embedding_project": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
              FROM embeddings),
            sc AS (
              SELECT vec_id, xs,
                     greatest(list_max(list_transform(xs, x -> abs(x))), 1e-12)
                       / 127.0 AS scale
              FROM v),
            q AS (
              SELECT vec_id,
                     list_transform(xs, x -> CAST(round(x / scale) AS BIGINT)) AS qv
              FROM sc)
            SELECT vec_id,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                        i -> qv[i] * ([-3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3])[i])) AS BIGINT) AS p0,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                        i -> qv[i] * ([-3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3])[i])) AS BIGINT) AS p1,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                        i -> qv[i] * ([-3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3])[i])) AS BIGINT) AS p2,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                        i -> qv[i] * ([-3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3])[i])) AS BIGINT) AS p3
            FROM q
        """,
        # Ground-truth energies straight from the synth formula: the
        # Spark side must decode the BYTES back to these numbers.
        "pcm_energy": """
            WITH frames AS (
              SELECT doc_id AS media_id, f.f AS frame_idx,
                     [ (((doc_id * 7 + (f.f * 160 + j) * (f.f * 160 + j)) % 2048)
                        - 1024) for j in generate_series(0, 159) ] AS s
              FROM documents, generate_series(0, 4) f(f))
            SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
                   CAST(160 AS INT) AS n_samples,
                   round(sqrt(CAST(list_sum(list_transform(s, x -> x * x))
                              AS DOUBLE) / 160), 6) AS energy
            FROM frames
        """,
        # Deterministic mode == rank-1 of (count desc, value asc).
        "survivorship": """
            WITH m AS (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type ASC) AS rn
              FROM events GROUP BY user_id, event_type),
            g AS (
              SELECT user_id, round(max(value), 6) AS max_value,
                     strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
              FROM events GROUP BY user_id)
            SELECT g.user_id, g.max_value, g.first_ts, m.event_type
            FROM g JOIN m ON m.user_id = g.user_id AND m.rn = 1
        """,
        # Two-sided neighbor windows over the probe/observation union;
        # lerp on the exact microsecond base.
        "interpolate": """
            WITH ev AS (
              SELECT user_id, ts, value FROM events WHERE user_id < 40),
            pr AS (
              SELECT user_id,
                     min(ts) + CAST(i * 30 AS INT) * INTERVAL 1 MINUTE AS ts
              FROM ev, generate_series(0, 3) g(i)
              GROUP BY user_id, i),
            un AS (
              SELECT user_id, ts, CAST(value AS DOUBLE) AS v, 1 AS is_obs
              FROM ev
              UNION ALL
              SELECT user_id, ts, NULL, 0 FROM pr),
            marked AS (
              SELECT user_id, ts, is_obs,
                     last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                       OVER wb AS pv,
                     last_value(CASE WHEN is_obs = 1 THEN epoch_us(ts) END
                                IGNORE NULLS) OVER wb AS pt,
                     first_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                       OVER wf AS nv,
                     first_value(CASE WHEN is_obs = 1 THEN epoch_us(ts) END
                                 IGNORE NULLS) OVER wf AS nt
              FROM un
              WINDOW wb AS (PARTITION BY user_id
                            ORDER BY ts ASC, is_obs DESC, v ASC NULLS FIRST
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wf AS (PARTITION BY user_id
                            ORDER BY ts ASC, is_obs DESC, v ASC NULLS FIRST
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
                   round(CASE WHEN pt = epoch_us(ts) THEN pv
                         WHEN pt IS NOT NULL AND nt IS NOT NULL
                         THEN pv + (epoch_us(ts) - pt)
                                   / CAST(nt - pt AS DOUBLE) * (nv - pv)
                         END, 6) AS value_interp,
                   CASE WHEN pt = epoch_us(ts) THEN 'exact'
                        WHEN pt IS NOT NULL AND nt IS NOT NULL THEN 'lerp'
                        END AS method
            FROM marked WHERE is_obs = 0
        """,
        # sessionize CTE + ordered list per session -> path counts.
        "top_paths": """
            WITH gaps AS (
              SELECT event_id, user_id, event_type, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR CAST(floor(epoch(ts)) AS BIGINT)
                               - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
            sess AS (
              SELECT user_id, event_type, ts, event_id,
                     sum(is_new) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC
                                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM gaps),
            paths AS (
              SELECT array_to_string(
                       (list(event_type ORDER BY ts ASC, event_id ASC))[1:8],
                       '>') AS path,
                     least(count(*), 8) AS n_steps
              FROM sess GROUP BY user_id, session_id)
            SELECT path, count(*) AS n, CAST(n_steps AS INT) AS n_steps
            FROM paths GROUP BY path, n_steps
            ORDER BY n DESC, path ASC LIMIT 20
        """,
        # DLT priorities ranked per language; (u+1)/2^32 never zero.
        "priority_sample_grouped": """
            SELECT lang, doc_id, n_chars FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY CAST(n_chars AS DOUBLE)
                         / ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             ::BIGINT + 1.0) / 4294967296.0) DESC,
                         doc_id ASC) AS rn
              FROM documents)
            WHERE rn <= 10
        """,
        "transition_matrix": """
            WITH pairs AS (
              SELECT lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS from_type,
                     event_type AS to_type
              FROM events),
            counts AS (
              SELECT from_type, to_type, count(*) AS n
              FROM pairs WHERE from_type IS NOT NULL
              GROUP BY from_type, to_type),
            tot AS (
              SELECT from_type, sum(n) AS t FROM counts GROUP BY from_type)
            SELECT c.from_type, c.to_type, c.n,
                   round(CAST(c.n AS DOUBLE) / t, 6) AS p
            FROM counts c JOIN tot USING (from_type)
        """,
        "merge_intervals": """
            WITH iv AS (
              SELECT user_id, ts AS s, ts + INTERVAL 15 MINUTE AS e
              FROM events),
            f AS (
              SELECT user_id, s, e,
                     CASE WHEN max(e) OVER wprev IS NULL
                            OR s > max(e) OVER wprev THEN 1 ELSE 0 END AS ni
              FROM iv
              WINDOW wprev AS (PARTITION BY user_id ORDER BY s ASC, e ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)),
            g AS (
              SELECT user_id, s, e,
                     sum(ni) OVER (PARTITION BY user_id ORDER BY s ASC, e ASC
                                   ROWS UNBOUNDED PRECEDING) AS island
              FROM f)
            SELECT user_id,
                   strftime(min(s), '%Y-%m-%d %H:%M:%S') AS island_start,
                   strftime(max(e), '%Y-%m-%d %H:%M:%S') AS island_end,
                   count(*) AS n_intervals
            FROM g GROUP BY user_id, island
        """,
        # Moments from decimal-exact sums, then the identical IEEE
        # expression tree — borderline rows agree with the Spark side.
        # PH statistic: prefix sums evaluate in the window's total
        # order, so both engines produce bit-identical doubles.
        "quality_drift": """
            WITH docs AS (
              SELECT source, doc_id,
                     CAST(n_chars + CASE WHEN source = 'src7'
                            AND row_number() OVER (PARTITION BY source
                                                   ORDER BY doc_id ASC)
                                > count(*) OVER (PARTITION BY source) / 2.0
                          THEN 150 ELSE 0 END AS DOUBLE) AS value
              FROM documents),
            st AS (
              SELECT source,
                     CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS mu,
                     CAST(sum(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS ex2
              FROM docs GROUP BY source),
            m AS (
              SELECT d.source, d.doc_id, d.value,
                     sqrt(ex2 - mu * mu) AS sigma,
                     sum(d.value - mu) OVER w AS mm
              FROM docs d JOIN st USING (source)
              WINDOW w AS (PARTITION BY d.source ORDER BY d.doc_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            ph AS (
              SELECT source, doc_id, value, sigma,
                     round(max(mm) OVER w2 - mm, 6) AS ph_up,
                     round(mm - min(mm) OVER w2, 6) AS ph_down
              FROM m
              WINDOW w2 AS (PARTITION BY source ORDER BY doc_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            SELECT source, doc_id, value, ph_up, ph_down
            FROM ph WHERE ph_up > 6.0 * sigma OR ph_down > 6.0 * sigma
        """,
        "grouped_outliers": """
            WITH s AS (
              SELECT event_type,
                     CAST(sum(CAST(value AS DECIMAL(38,10)))
                          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
                     CAST(sum(CAST(value * value AS DECIMAL(38,10)))
                          AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS ex2
              FROM events GROUP BY event_type)
            SELECT event_id, e.event_type,
                   round((value - mu) / sqrt(ex2 - mu * mu), 6) AS z_score
            FROM events e JOIN s USING (event_type)
            WHERE abs(round((value - mu) / sqrt(ex2 - mu * mu), 6)) > 3.0
        """,
        "temperature_sample": """
            WITH c AS (
              SELECT lang, count(*) AS n,
                     round(pow(CAST(count(*) AS DOUBLE), 0.5), 6) AS w
              FROM documents GROUP BY lang),
            m AS (SELECT max(w / n) AS max_rate FROM c),
            r AS (SELECT lang, (w / n) / max_rate AS rate FROM c, m)
            SELECT d.lang, count(*) AS n_kept
            FROM documents d JOIN r USING (lang)
            WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                     ::BIGINT / 4294967296.0) < r.rate
            GROUP BY d.lang
        """,
        # replayed rows are exact copies, so the deduped stream equals
        # the original events — assert the per-type totals.
        "stream_dedup": """
            SELECT event_type, count(*) AS n,
                   round(sum(value), 6) AS total_value
            FROM events GROUP BY event_type
        """,
        "oov_rate": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS token
              FROM documents),
            counts AS (
              SELECT token, count(*) AS freq FROM tok
              GROUP BY token HAVING count(*) >= 2),
            vocab AS (
              SELECT token FROM counts
              ORDER BY freq DESC, token ASC LIMIT 200)
            SELECT t.doc_id, count(*) AS n_tokens,
                   CAST(count(*) FILTER (WHERE v.token IS NULL) AS BIGINT)
                     AS n_oov,
                   round(CAST(count(*) FILTER (WHERE v.token IS NULL)
                              AS DOUBLE) / count(*), 6) AS oov_rate
            FROM tok t LEFT JOIN vocab v USING (token)
            GROUP BY t.doc_id
        """,
        # date_trunc('week', ..) is ISO-Monday in both engines; the
        # offset is integer microsecond arithmetic.
        "cohort_retention": """
            WITH first AS (
              SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
              FROM events GROUP BY user_id)
            SELECT f.cohort_week,
                   (epoch_us(e.ts) - epoch_us(f.cohort_week))
                     // 604800000000 AS week_offset,
                   count(DISTINCT e.user_id) AS n_users
            FROM events e JOIN first f USING (user_id)
            GROUP BY 1, 2
        """,
        # One-shot join+aggregate the incremental JOIN view must equal;
        # decimal revenue sums match the Spark side exactly.
        "incremental_join_agg": """
            SELECT r_name,
                   round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                       AS DECIMAL(18,4))) AS DOUBLE), 6)
                     AS revenue,
                   count(*) AS n
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        # Normal equations with decimal-exact moment sums; the Cramer
        # expression trees mirror operators/aggregate.py verbatim.
        "multiple_regression": """
            WITH s AS (
              SELECT l_returnflag,
                     CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS s1,
                     CAST(sum(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) AS s2,
                     CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS s11,
                     CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(38,10))) AS DOUBLE) AS s12,
                     CAST(sum(CAST(l_discount * l_discount AS DECIMAL(38,10))) AS DOUBLE) AS s22,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sy,
                     CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS s1y,
                     CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS s2y
              FROM lineitem GROUP BY l_returnflag),
            d AS (
              SELECT *,
                     n * (s11 * s22 - s12 * s12)
                       - s1 * (s1 * s22 - s12 * s2)
                       + s2 * (s1 * s12 - s11 * s2) AS det,
                     sy * (s11 * s22 - s12 * s12)
                       - s1 * (s1y * s22 - s12 * s2y)
                       + s2 * (s1y * s12 - s11 * s2y) AS det0,
                     n * (s1y * s22 - s12 * s2y)
                       - sy * (s1 * s22 - s12 * s2)
                       + s2 * (s1 * s2y - s1y * s2) AS det1,
                     n * (s11 * s2y - s1y * s12)
                       - s1 * (s1 * s2y - s1y * s2)
                       + sy * (s1 * s12 - s11 * s2) AS det2
              FROM s)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   round(CASE WHEN det = 0 THEN NULL ELSE det0 / det END, 6) AS b0,
                   round(CASE WHEN det = 0 THEN NULL ELSE det1 / det END, 6) AS b1,
                   round(CASE WHEN det = 0 THEN NULL ELSE det2 / det END, 6) AS b2
            FROM d
        """,
        # Decontamination: distinct-3gram overlap of each doc against
        # the benchmark shingle set (docs % 50 == 0), same shingles.
        "decontaminate": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            bench AS (
              SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 50 = 0),
            ex AS (
              SELECT doc_id, len(s) AS n_shingles, unnest(s) AS shingle FROM sh),
            hits AS (
              SELECT ex.doc_id, ex.n_shingles,
                     CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hit
              FROM ex LEFT JOIN bench b ON ex.shingle = b.shingle
              GROUP BY ex.doc_id, ex.n_shingles)
            SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles, n_hit,
                   round(CASE WHEN n_shingles > 0
                              THEN CAST(n_hit AS DOUBLE) / n_shingles
                              ELSE 0.0 END, 6) AS hit_frac,
                   CASE WHEN n_shingles > 0
                        THEN CAST(n_hit AS DOUBLE) / n_shingles >= 0.5
                        ELSE FALSE END AS contaminated
            FROM hits
        """,
        # Repetition signals: duplicate-3gram fraction + top-word share
        # (split-on-space words, same shingle construction).
        "repetition_score": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id, w,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE [array_to_string(w[i:i+2], ' ')
                                for i in generate_series(1, len(w) - 2)]
                     END AS s
              FROM words),
            base AS (
              SELECT doc_id,
                     CASE WHEN len(s) > 0
                          THEN 1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / len(s)
                          ELSE 0.0 END AS dup_frac,
                     len(w) AS nw
              FROM sh),
            tw AS (
              SELECT doc_id, max(cnt) AS topc FROM (
                SELECT doc_id, word, count(*) AS cnt
                FROM (SELECT doc_id, unnest(w) AS word FROM words)
                GROUP BY doc_id, word)
              GROUP BY doc_id)
            SELECT b.doc_id,
                   round(dup_frac, 6) AS r_dup_3gram_frac,
                   round(CASE WHEN nw > 0 THEN CAST(topc AS DOUBLE) / nw
                              ELSE 0.0 END, 6) AS r_top_word_frac
            FROM base b LEFT JOIN tw USING (doc_id)
        """,
        # Top-V vocabulary: identical tokenization + (freq desc, token
        # asc) dense rank ids.
        "vocab_build": r"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS token
              FROM documents),
            counts AS (
              SELECT token, count(*) AS freq FROM tok
              GROUP BY token HAVING count(*) >= 2),
            ranked AS (
              SELECT token, freq,
                     row_number() OVER (ORDER BY freq DESC, token ASC) - 1
                       AS token_id
              FROM counts)
            SELECT token, CAST(token_id AS INT) AS token_id, freq
            FROM ranked WHERE token_id < 200
        """,
        # Concat-and-cut packing manifest: md5-derived shard, per-shard
        # prefix sums, cut every 512 tokens, boundary docs split.
        "sequence_pack": r"""
            WITH d AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS nt,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
                       AS shard
              FROM documents),
            s AS (
              SELECT doc_id, nt, shard,
                     CAST(sum(nt) OVER (PARTITION BY shard ORDER BY doc_id ASC
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
              FROM d WHERE nt > 0),
            x AS (SELECT doc_id, nt, shard, e, e - nt AS st FROM s),
            ex AS (
              SELECT *, unnest(generate_series(st // 512, (e - 1) // 512)) AS seq
              FROM x)
            SELECT shard, seq, doc_id,
                   greatest(st, seq * 512) - st AS doc_offset,
                   greatest(st, seq * 512) - seq * 512 AS seq_offset,
                   least(e, seq * 512 + 512) - greatest(st, seq * 512) AS span_len
            FROM ex
        """,
        # min-over-shingles md5 fingerprint, replicated verbatim.
        "fingerprint": """
            SELECT doc_id,
                   list_aggregate(
                     list_transform(generate_series(1, greatest(1, length(text) - 31)),
                                    i -> substr(md5(substr(text, i, 32)), 1, 16)),
                     'min') AS fingerprint
            FROM documents
        """,
        # Sliding-window retrieval chunks: offsets 0, 90, 180, ... while
        # inside the text; substring clamps the tail chunk identically.
        "chunk_documents": """
            WITH base AS (
              SELECT doc_id, text,
                     ((length(text) - 1) // 90) + 1 AS n_chunks
              FROM documents WHERE length(text) > 0
            ),
            ex AS (
              SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_id
              FROM base
            )
            SELECT doc_id,
                   CAST(chunk_id AS BIGINT) AS chunk_id,
                   CAST(chunk_id * 90 AS BIGINT) AS chunk_start,
                   substring(text, CAST(chunk_id * 90 + 1 AS INT), 120) AS chunk_text,
                   CAST(length(substring(text, CAST(chunk_id * 90 + 1 AS INT), 120))
                        AS BIGINT) AS chunk_len
            FROM ex
        """,
        # Lee-et-al segment dedup: first global occurrence of every
        # 16-word segment wins (doc_id, then position); documents are
        # rebuilt from surviving segments in position order.
        "segment_dedup": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE length(text) > 0
            ),
            b2 AS (
              SELECT doc_id, w, ((len(w) - 1) // 16) + 1 AS n_seg FROM base
            ),
            segs AS (
              SELECT doc_id, w, unnest(range(0, n_seg)) AS seg_idx FROM b2
            ),
            st AS (
              SELECT doc_id, seg_idx,
                     array_to_string(
                       w[CAST(seg_idx * 16 + 1 AS INT):CAST(seg_idx * 16 + 16 AS INT)],
                       ' ') AS seg_text
              FROM segs
            ),
            fl AS (
              SELECT doc_id, seg_idx, seg_text,
                     row_number() OVER (PARTITION BY seg_text
                                        ORDER BY doc_id, seg_idx) = 1 AS keep
              FROM st
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(coalesce(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS kept_segments,
                   coalesce(string_agg(CASE WHEN keep THEN seg_text END,
                                       ' ' ORDER BY seg_idx), '') AS dedup_text
            FROM fl GROUP BY doc_id
        """,
        # Token-budget mixture sampling: md5-shuffled order per source,
        # running sum windowed (CAST — DuckDB window sums are HUGEINT),
        # keep while cum <= budget.
        "token_budget_sample": """
            WITH base AS (
              SELECT source, doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     md5(CAST(doc_id AS VARCHAR)) AS k
              FROM documents
            ),
            c AS (
              SELECT source, doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (PARTITION BY source
                            ORDER BY k, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS cum_tokens
              FROM base
            )
            SELECT source, doc_id, n_tokens, cum_tokens
            FROM c WHERE cum_tokens <= 600
        """,
        # Top-5 TF-IDF terms per doc; idf is the exact rational
        # (N+1)/(df+1) so the one double division is IEEE-identical in
        # both engines; ties break on term text.
        "tfidf_topk": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents
            ),
            tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM toks WHERE term <> '' GROUP BY doc_id, term
            ),
            dfreq AS (
              SELECT term, CAST(count(*) AS BIGINT) AS doc_freq
              FROM tf GROUP BY term
            ),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
                     CAST(tf.tf * (n.n_docs + 1) AS DOUBLE)
                       / CAST(dfreq.doc_freq + 1 AS DOUBLE) AS score
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term ASC) AS rnk
              FROM scored
            )
            SELECT doc_id, term, tf, doc_freq, score,
                   CAST(rnk AS BIGINT) AS "rank"
            FROM r WHERE rnk <= 5
        """,
        # Ternary sparse-random-projection LSH: identical md5-seeded
        # weights, buckets, and exact rerank.
        "embedding_lsh": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            dots AS (
              SELECT vec_id, p,
                     list_dot_product(v, list_transform(range(len(v)),
                       d -> CAST(CASE WHEN (instr('0123456789abcdef',
                                   substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) < 4
                                 THEN -1.0
                                 WHEN (instr('0123456789abcdef',
                                   substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) < 8
                                 THEN 1.0
                                 ELSE 0.0 END AS DOUBLE))) AS dp
              FROM e, generate_series(0, 5) g(p)),
            buck AS (
              SELECT vec_id,
                     SUM(CASE WHEN dp >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)
                       AS bucket
              FROM dots GROUP BY vec_id),
            q AS (SELECT vec_id AS query_id, v AS qv, bucket
                  FROM e JOIN buck USING (vec_id) WHERE vec_id < 5),
            c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket
                  FROM e JOIN buck USING (vec_id)),
            scored AS (
              SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
              FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        # Quantize-then-rerank: identical int8 quantization, BIGINT
        # candidate dots (bit-exact), top-15 approx candidates, exact
        # full-precision rerank to top-5.
        "embedding_quantized_topk": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
              FROM embeddings),
            s AS (
              SELECT vec_id, xs,
                     greatest(list_max(list_transform(xs, x -> abs(x))), 1e-12)
                       / 127.0 AS scale
              FROM v),
            q AS (
              SELECT vec_id, xs,
                     list_transform(xs, x -> CAST(round(x / scale) AS INT)) AS qv
              FROM s),
            qq AS (SELECT vec_id AS query_id, xs AS qxs, qv AS qqv
                   FROM q WHERE vec_id < 5),
            cand AS (
              SELECT query_id, c.vec_id AS neighbor_id, c.xs AS nxs, qxs,
                     CAST(list_sum(list_transform(list_zip(c.qv, qqv),
                       p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT) AS qdot,
                     CAST(list_sum(list_transform(c.qv,
                       x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS n2a,
                     CAST(list_sum(list_transform(qqv,
                       x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS n2b
              FROM q c, qq WHERE c.vec_id <> query_id),
            topm AS (
              SELECT query_id, neighbor_id, nxs, qxs,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY qdot / (sqrt(n2a) * sqrt(n2b)) DESC,
                                neighbor_id ASC) AS rn
              FROM cand),
            rer AS (
              SELECT query_id, neighbor_id,
                     list_cosine_similarity(qxs, nxs) AS sim
              FROM topm WHERE rn <= 15),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM rer)
            SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        # Cosine near-dup pairs: identical ternary buckets (4 planes),
        # within-bucket self-join, exact cosine >= 0.3.
        "embedding_dups": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            dots AS (
              SELECT vec_id, p,
                     list_dot_product(v, list_transform(range(len(v)),
                       d -> CAST(CASE WHEN (instr('0123456789abcdef',
                                   substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) < 4
                                 THEN -1.0
                                 WHEN (instr('0123456789abcdef',
                                   substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) < 8
                                 THEN 1.0
                                 ELSE 0.0 END AS DOUBLE))) AS dp
              FROM e, generate_series(0, 3) g(p)),
            buck AS (
              SELECT vec_id,
                     SUM(CASE WHEN dp >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)
                       AS bucket
              FROM dots GROUP BY vec_id),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_cosine_similarity(ea.v, eb.v) AS cs
              FROM buck a JOIN buck b
                     ON a.bucket = b.bucket AND a.vec_id < b.vec_id
                   JOIN e ea ON ea.vec_id = a.vec_id
                   JOIN e eb ON eb.vec_id = b.vec_id)
            SELECT id_a, id_b, round(cs, 4) AS cos_sim
            FROM pairs WHERE cs >= 0.3
        """,
        # IVF: md5-ordered centroid sample, nearest-cell assignment,
        # nprobe=4 probing, exact rerank — all replicated.
        # ivf_nprobe_tuning (r17): full replica of the one-pass trick —
        # a truth pair is retrieved at probe width p iff its cell's
        # rank in the query's centroid ordering is <= p; the curve is
        # a cumulative count. Same deterministic md5-ordered centroid
        # sample as embedding_ivf.
        "ivf_nprobe_tuning": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            cents AS (SELECT vec_id AS cid, v AS cv FROM e
                      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8),
            truth AS (
              SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY list_cosine_similarity(q.v, e.v) DESC,
                                                   e.vec_id ASC) AS rk
                FROM e q JOIN e ON e.vec_id <> q.vec_id
                WHERE q.vec_id < 5) WHERE rk <= 5),
            ncell AS (
              SELECT neighbor_id, cell FROM (
                SELECT n.vec_id AS neighbor_id, c.cid AS cell,
                       row_number() OVER (PARTITION BY n.vec_id
                                          ORDER BY list_cosine_similarity(n.v, c.cv) DESC,
                                                   c.cid ASC) AS rn
                FROM (SELECT DISTINCT neighbor_id FROM truth) t
                     JOIN e n ON n.vec_id = t.neighbor_id, cents c)
              WHERE rn = 1),
            qc AS (
              SELECT query_id, cell, cent_rank FROM (
                SELECT q.vec_id AS query_id, c.cid AS cell,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY list_cosine_similarity(q.v, c.cv) DESC,
                                                   c.cid ASC) AS cent_rank
                FROM e q, cents c WHERE q.vec_id < 5)),
            pairs AS (
              SELECT t.query_id, qc.cent_rank
              FROM truth t JOIN ncell USING (neighbor_id)
                   JOIN qc ON qc.query_id = t.query_id
                          AND qc.cell = ncell.cell),
            tot AS (SELECT count(*) AS n_truth FROM truth),
            grid AS (SELECT CAST(g AS INT) AS nprobe
                     FROM generate_series(1, 8) AS t(g)),
            ret AS (SELECT grid.nprobe AS np, count(*) AS n_retrieved
                    FROM pairs, grid WHERE cent_rank <= grid.nprobe
                    GROUP BY grid.nprobe)
            SELECT grid.nprobe,
                   CAST(coalesce(ret.n_retrieved, 0) AS BIGINT) AS n_retrieved,
                   tot.n_truth,
                   round(coalesce(ret.n_retrieved, 0) / tot.n_truth, 4)
                     AS avg_recall
            FROM grid LEFT JOIN ret ON ret.np = grid.nprobe
                 CROSS JOIN tot
            ORDER BY grid.nprobe
        """,
        "embedding_ivf": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cents AS (SELECT vec_id AS cid, v AS cv FROM e
                      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8),
            ca AS (
              SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cid AS cell,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                   c.cid ASC) AS rn
                FROM e, cents c) WHERE rn = 1),
            qp AS (
              SELECT query_id, cell FROM (
                SELECT e.vec_id AS query_id, c.cid AS cell,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                   c.cid ASC) AS rn
                FROM e, cents c WHERE e.vec_id < 5) WHERE rn <= 4),
            scored AS (
              SELECT DISTINCT qp.query_id, ca.vec_id AS neighbor_id,
                     list_cosine_similarity(q.v, n.v) AS sim
              FROM qp JOIN ca USING (cell)
                   JOIN e q ON q.vec_id = qp.query_id
                   JOIN e n ON n.vec_id = ca.vec_id
              WHERE ca.vec_id <> qp.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        "entrez_gene_load": """
            SELECT 'Feature' AS cls, 'gene' AS biotype,
                   CASE WHEN p_partkey%10=0 THEN 'x'||p_partkey
                        ELSE CAST(p_partkey AS VARCHAR) END AS sourceId,
                   'G'||p_partkey AS name,
                   'G'||p_partkey AS displayName,
                   'desc '||p_partkey AS longName,
                   CASE WHEN p_partkey%2=0 THEN 'sum '||p_partkey END AS description,
                   'https://www.ncbi.nlm.nih.gov/gene/' ||
                     CASE WHEN p_partkey%10=0 THEN 'x'||p_partkey
                          ELSE CAST(p_partkey AS VARCHAR) END AS url,
                   CASE WHEN p_partkey%10=0
                        THEN 'spec: uid (^\\d+$) and name are required' END AS _error
            FROM part
        """,
        "dbsnp_docsum": """
            WITH src AS (
              SELECT p_partkey AS k,
                     CASE WHEN p_partkey%4=0 THEN 'GENE=X;LEN=1'
                          ELSE 'GENE=X;HGVS=NC_'||p_partkey||':g.5A&gt;T,NM_'||p_partkey
                               ||':c.'||p_partkey||'T&gt;A,NP_'||p_partkey
                               ||':p.V'||p_partkey||'E;LEN=1' END AS docsum
              FROM part),
            nots AS (
              SELECT k, list_sort(string_split(regexp_replace(
                       list_filter(string_split(replace(docsum,'&gt;','>'),';'),
                                   x -> x LIKE 'HGVS=%')[1],
                       '^HGVS=',''),','),'DESC') AS notations
              FROM src)
            SELECT CAST(k AS VARCHAR) AS sourceId,
                   'rs'||k AS name,
                   list_filter(notations, x -> regexp_matches(x,'^NM_\\d+.*:c\\..*'))[1] AS hgvs_cds,
                   list_filter(notations, x -> regexp_matches(x,'^NP_\\d+.*:p\\..*'))[1] AS hgvs_protein,
                   coalesce(
                     list_filter(notations, x -> regexp_matches(x,'^NM_\\d+.*:c\\..*'))[1],
                     list_filter(notations, x -> regexp_matches(x,'^NP_\\d+.*:p\\..*'))[1]
                   ) AS infers_notation
            FROM nots
        """,
        "hgnc_load": """
            WITH c AS (SELECT c_custkey AS k FROM customer),
            sym AS (SELECT k, 'Gene'||k||CASE WHEN k%6=0 THEN 'ORF7' ELSE '' END AS symbol
                    FROM c)
            SELECT symbol AS name, 'HGNC:'||k AS sourceId, FALSE AS deprecated,
                   replace(upper(symbol),'ORF','orf') AS displayName,
                   FALSE AS has_dep, '2024-01-01' AS sourceIdVersion
            FROM sym
            UNION ALL
            SELECT 'Prev'||k, 'HGNC:'||k, TRUE, 'PREV'||k, TRUE, NULL
            FROM c WHERE k%3=0
            UNION ALL
            SELECT 'Al'||k, 'HGNC:'||k, FALSE, 'AL'||k, TRUE, NULL
            FROM c WHERE k%4=0
        """,
        "refseq_ladder": """
            WITH p AS (SELECT p_partkey AS k FROM part)
            SELECT 'gene' AS biotype, CAST(k AS VARCHAR) AS sourceId,
                   CAST(NULL AS VARCHAR) AS sourceIdVersion FROM p
            UNION ALL SELECT 'transcript', 'NM_'||k, CAST(k%9+1 AS VARCHAR) FROM p
            UNION ALL SELECT 'transcript', 'NM_'||k, NULL FROM p
            UNION ALL SELECT 'protein', 'NP_'||k, CAST(k%5+1 AS VARCHAR) FROM p WHERE k%3<>0
            UNION ALL SELECT 'protein', 'NP_'||k, NULL FROM p WHERE k%3<>0
        """,
        "fda_srs_load": """
            SELECT 'U'||s_suppkey AS sourceId, 'drug'||s_suppkey AS name,
                   CASE WHEN s_suppkey%2=0 AND s_suppkey%40>=25
                        THEN 'ncit therapy not found: C'||(s_suppkey%40) END AS _error
            FROM supplier WHERE s_suppkey%7<>0
        """,
        "chembl_load": """
            WITH p AS (SELECT p_partkey AS k FROM part),
            d AS (SELECT k,
                    CASE WHEN k%2=0 THEN 'CHEMBL' ELSE 'chembl' END || k AS id,
                    CASE WHEN k%3<>0 THEN 'drug'||k ELSE 'C'||k||'H2' END AS name,
                    'C'||k||'H2' AS mol
                  FROM p)
            SELECT id AS sourceId, name, name||' ['||upper(id)||']' AS displayName,
                   mol AS molecularFormula, CAST(NULL AS VARCHAR) AS comment
            FROM d
            UNION ALL
            SELECT DISTINCT 'stem'||(k%3), 'stem'||(k%3), 'stem'||(k%3),
                   CAST(NULL AS VARCHAR), 'usan stem definition'
            FROM p WHERE k%5=0
        """,
        "asco_abstracts": """
            WITH c AS (SELECT c_custkey AS k FROM customer),
            g AS (SELECT k//2 AS g, MAX(k%2) AS has_odd FROM c GROUP BY k//2)
            SELECT CAST(g AS VARCHAR) AS abstractNumber,
                   CASE WHEN has_odd=1 THEN 'auth'||g END AS authors,
                   'M'||(g%5)||' (abstract '||g||')' AS displayName,
                   'M'||(g%5) AS meeting,
                   't'||g AS name,
                   'a'||(2*g+has_odd) AS sourceId,
                   CASE WHEN has_odd=1 THEN 'u'||g END AS url,
                   CAST(2010+g%7 AS INTEGER) AS year
            FROM g
        """,
        "fda_approvals_year": """
            SELECT '/'||p_partkey AS sourceId, 'T'||p_partkey AS name,
                   'T'||p_partkey AS displayName,
                   'https://www.fda.gov/'||p_partkey AS url,
                   CASE WHEN p_partkey%3=0
                        THEN CAST(2000+p_partkey%20 AS INTEGER) END AS year
            FROM part
        """,
        "pmc_fusions": """
            WITH s AS (SELECT s_suppkey AS k,
                   CASE WHEN s_suppkey%2=0 THEN 'yes' ELSE 'no' END AS ka,
                   CASE WHEN s_suppkey%3=0 THEN 'yes' ELSE 'no' END AS kb
                 FROM supplier)
            SELECT 'A'||k AS geneA, 'B'||k AS geneB,
                   CASE WHEN ka='yes' THEN 'A'||k ELSE 'B'||k END AS subject_gene,
                   '(A'||k||',B'||k||'):fusion(g.'||k||',g.'||(k+1)||')' AS variant_displayName,
                   'g.'||k AS break1Repr,
                   'likely gain of function' AS relevance,
                   CASE WHEN ka=kb THEN 'skipping: cannot determine kinase partner' END AS _error
            FROM s
        """,
        "pmc_functional": """
            WITH p AS (SELECT p_partkey AS k FROM part
                       WHERE p_partkey%5<>0 AND p_partkey%4<>1)
            SELECT 'g'||k AS gene,
                   'p.V'||(k%700+1)||'E' AS variant_notation,
                   CASE WHEN k%4=0 THEN 'likely gain of function'
                        WHEN k%4=2 THEN 'dominant negative'
                        ELSE 'loss of function' END AS relevance,
                   '25348012' || CASE WHEN k%2=0 THEN ',123,456' ELSE '' END AS evidence
            FROM p
        """,
        "docm_load": """
            WITH p AS (SELECT p_partkey AS k FROM part)
            SELECT 'h'||k AS hgvs,
                   CASE WHEN k%3=0 THEN 'p.K'||(k%700+1)||'_K'||(k%700+2)||'delKK'
                        ELSE 'p.G'||(k%700+1)||'D' END AS protein_notation,
                   (k%22+1) || ':g.' ||
                   CASE WHEN k%4=0 THEN k||'A>T'
                        WHEN k%4=1 THEN CASE WHEN k%2=0 THEN k||'delA'
                                             ELSE k||'_'||(k+1)||'delA' END
                        WHEN k%4=2 THEN k||'_'||(k+k%2)||'insT'
                        ELSE CASE WHEN k%2=0 THEN k||'delAinsT'
                                  ELSE k||'_'||(k+1)||'delAinsT' END
                   END AS genomic_notation,
                   'doid:'||(k%50) AS disease_doid,
                   CAST(k AS VARCHAR) AS pubmed_id,
                   'recurrent' AS relevance,
                   CASE WHEN k%5=0 THEN 'skip: disease tag count != 1' END AS _error
            FROM p
        """,
        "cgl_load": """
            WITH p AS (SELECT p_partkey AS k FROM part)
            SELECT 'NM_'||k AS transcript_id,
                   CAST(k%9+1 AS VARCHAR) AS transcript_version,
                   CASE WHEN k%11<>0 THEN 'c.'||k||'A>G' END AS cds_notation,
                   CASE WHEN k%4=0 THEN 'p.R'||(k%700+1)||'H'
                        WHEN k%4=1 THEN 'p.L'||(k%700+1)||'Ter'
                        WHEN k%4=2 THEN 'p.L'||(k%700+1)||'fs*3' END AS protein_notation,
                   CASE WHEN k%3=0 THEN 'g.100C>T'
                        WHEN k%3=1 THEN 'g.100_101delAG' END AS genomic_notation,
                   CASE WHEN k%11=0 THEN 'invalid HGVSc notation (x.1del)'
                        WHEN k%3=2 THEN 'unexpected ref vs alt combination' END AS _error
            FROM p
        """,
        "entrez_refseq": """
            WITH p AS (SELECT p_partkey AS k FROM part)
            SELECT 'Feature' AS cls,
                   CASE WHEN k%3=0 THEN 'transcript'
                        WHEN k%3=1 THEN 'protein'
                        ELSE 'chromosome' END AS biotype,
                   CASE WHEN k%10=0 THEN 'bogus'
                        ELSE CASE WHEN k%3=0 THEN 'NM_' WHEN k%3=1 THEN 'NP_'
                             ELSE 'NC_' END || k END AS sourceId,
                   CASE WHEN k%10=0 THEN NULL
                        ELSE CAST(k%7+1 AS VARCHAR) END AS sourceIdVersion,
                   CASE WHEN k%10=0 THEN 'BOGUS'
                        ELSE CASE WHEN k%3=0 THEN 'NM_' WHEN k%3=1 THEN 'NP_'
                             ELSE 'NC_' END || k || '.' || (k%7+1) END AS displayName,
                   'title '||k AS longName,
                   CASE WHEN k%3=2 THEN CAST(k%22+1 AS VARCHAR) END AS name,
                   CASE WHEN k%10=0
                        THEN 'spec: accessionversion (^N[A-Z]_\\d+\\.\\d+$) / biomol / title'
                   END AS _error
            FROM p
        """,
        "gsc_ontology": """
            WITH s AS (SELECT s_suppkey AS k FROM supplier)
            SELECT 'drug'||k AS name, 'drug'||k AS sourceId, '' AS subsets
            FROM s WHERE k%2=1
            UNION ALL
            SELECT 'alias'||k, 'alias'||k, '' FROM s WHERE k%4=0
            UNION ALL
            SELECT DISTINCT 'class'||(k%10)||' inhibitor', 'class'||(k%10)||' inhibitor',
                   'specific drug class' FROM s
            UNION ALL
            SELECT DISTINCT 'family'||(k%5), 'family'||(k%5), 'general drug class' FROM s
            UNION ALL
            SELECT DISTINCT 'pathway'||(k%3), 'pathway'||(k%3), 'pathway drug class' FROM s
        """,
        # full rid-algebra replica of statements -> load_variants linking:
        # same content hashes, COMPLEX genomic forms quarantined (no
        # 'indel' vocabulary) so their Infers edge is absent
        "statement_variant_link": """
            WITH p AS (SELECT p_partkey AS k FROM part WHERE p_partkey % 5 <> 0),
            built AS (
              SELECT k,
                     'h' || k AS sourceId,
                     'g' || k || ':' ||
                     CASE WHEN k%3=0 THEN 'p.K'||(k%700+1)||'_K'||(k%700+2)||'delKK'
                          ELSE 'p.G'||(k%700+1)||'D' END AS prot_note,
                     (k%22+1) || ':g.' ||
                     CASE WHEN k%4=0 THEN k||'A>T'
                          WHEN k%4=1 THEN CASE WHEN k%2=0 THEN k||'delA'
                                               ELSE k||'_'||(k+1)||'delA' END
                          WHEN k%4=2 THEN k||'_'||(k+k%2)||'insT'
                          ELSE CASE WHEN k%2=0 THEN k||'delAinsT'
                                    ELSE k||'_'||(k+1)||'delAinsT' END
                     END AS gen_note,
                     'doid:'||(k%50) AS disease_doid
              FROM p),
            hashed AS (
              SELECT *,
                     md5('{"cls":"PositionalVariant","displayName":"' || prot_note
                         || '","source":"docm-demo"}') AS variant_rid,
                     md5('{"cls":"PositionalVariant","displayName":"' || gen_note
                         || '","source":"docm-demo"}') AS genomic_rid
              FROM built)
            SELECT sourceId, variant_rid, genomic_rid, disease_doid,
                   'recurrent' AS relevance,
                   TRUE AS variant_found,
                   k % 4 <> 3 AS infers_ok,
                   array_to_string(list_sort([variant_rid, disease_doid]), '|')
                     AS conditions_str
            FROM hashed
        """,
        "source_registry": """
            WITH r(name, "displayName", url, usage, version, sort) AS (
              VALUES """ + _registry_values() + """)
            SELECT md5('{"cls":"Source","name":"' || name || '"}') AS rid,
                   name, "displayName", url, usage, version, sort
            FROM r
        """,
        # full replica of the CIViC sync composition: publication / disease /
        # evidence-level resolution + relevance + DNF + therapy grouping +
        # conditions/content-key build, with identical md5 stable-hash ids
        "civic_sync": _civic_pipeline_ctes() + """
            SELECT k, source_type, publication_rid, disease_rid, evidence_level_rid,
                   relevance, therapy,
                   array_to_string(conditions, '|') AS conditions_str,
                   md5('{"conditions":["' || array_to_string(conditions, '","')
                       || '"],"relevance":'
                       || CASE WHEN relevance IS NULL THEN 'null'
                               ELSE '"' || relevance || '"' END
                       || ',"sourceId":"' || sourceId || '"}') AS content_key,
                   coalesce(pub_error, disease_error,
                            CASE WHEN relevance IS NULL
                                 THEN 'untranslatable relevance' END) AS err
            FROM final
        """,
        # the reconcile write-half on the same pipeline: stored rows are
        # the even-k candidates (strong-key matches -> update keeping the
        # stored rid) plus per-source tombstones (no counterpart -> delete);
        # odd-k candidates have no stored row -> create
        "civic_sync_reconcile": _civic_pipeline_ctes() + """
            , scored AS (
              SELECT k, sourceId, conditions, relevance,
                     md5('{"conditions":["' || array_to_string(conditions, '","')
                         || '"],"relevance":'
                         || CASE WHEN relevance IS NULL THEN 'null'
                                 ELSE '"' || relevance || '"' END
                         || ',"sourceId":"' || sourceId || '"}') AS content_key,
                     coalesce(pub_error, disease_error,
                              CASE WHEN relevance IS NULL
                                   THEN 'untranslatable relevance' END) AS err
              FROM final),
            cand AS (
              SELECT DISTINCT k, sourceId, conditions, relevance, content_key
              FROM scored WHERE err IS NULL)
            SELECT sourceId, array_to_string(conditions, '|') AS conditions_str,
                   relevance, 'st_' || content_key AS rid, 'update' AS action
            FROM cand WHERE k % 2 = 0
            UNION ALL
            SELECT sourceId, array_to_string(conditions, '|'), relevance,
                   content_key, 'create'
            FROM cand WHERE k % 2 = 1
            UNION ALL
            SELECT DISTINCT sourceId, 'ZZZ' || sourceId, 'tombstone',
                   'del_' || sourceId, 'delete'
            FROM cand WHERE k % 2 = 0
        """,
    }
    # retrieval eval composes the two (already-verified) ANN oracles:
    # recall@5 and MRR of the quantized pipeline vs the exact one.
    oracles["ann_recall_eval"] = f"""
        WITH e0 AS (SELECT * FROM ({oracles["embedding_topk"]})),
        a0 AS (SELECT * FROM ({oracles["embedding_quantized_topk"]})),
        j AS (SELECT e0.query_id, e0.neighbor_id, e0.rank AS erank,
                     a0.rank AS arank
              FROM e0 LEFT JOIN a0
                ON e0.query_id = a0.query_id
               AND e0.neighbor_id = a0.neighbor_id),
        r AS (SELECT query_id, round(count(arank) / 5.0, 4) AS recall_at_5
              FROM j GROUP BY query_id),
        m AS (SELECT query_id, round(coalesce(1.0 / arank, 0.0), 4) AS mrr
              FROM j WHERE erank = 1)
        SELECT r.query_id, recall_at_5, mrr
        FROM r JOIN m ON r.query_id = m.query_id
    """
    # streaming near-dup suppression: id-ordered arrival makes the
    # stream equal to the static keep-lowest-id rule, so its oracle is
    # the minhash_lsh pair replica with the final select flipped to
    # per-document keep flags.
    # streaming decontamination is stateless per micro-batch and each
    # document arrives whole in one batch, so the stream's complete
    # output IS the batch flag query — same oracle, value-hash equal
    oracles["stream_decontaminate"] = oracles["exactsubstr_decontaminate"]
    # r16: the decimal-engine sibling is value-identical to the int64
    # registry query on <=2-decimal inputs (pinned at sf0.1 in
    # tests/test_round8_ops.py) — same oracle, so the driver VERIFIES
    # the two-engine equivalence every round instead of assuming it
    oracles["rolling_zscore_decimal"] = oracles["rolling_zscore"]
    # r15: the streaming suite gate is value-equal to the batch
    # multi-benchmark flag by design (stateless per batch, per-doc
    # columns only) — same oracle, so the driver VERIFIES the
    # stream/batch equivalence every round instead of assuming it
    oracles["stream_multi_decontaminate"] = oracles["multi_benchmark_flag"]
    oracles["stream_minhash_dedup"] = oracles["minhash_lsh"].replace(
        "SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac WHERE j >= 0.6",
        "SELECT d.doc_id, dx.id_b IS NULL AS keep FROM documents d "
        "LEFT JOIN (SELECT DISTINCT id_b FROM jac WHERE j >= 0.6) dx "
        "ON d.doc_id = dx.id_b",
    )
    # the replace() above is string surgery on minhash_lsh's final
    # SELECT; if that line is ever reworded the replace silently
    # no-ops and this oracle becomes the pair query — fail loudly.
    assert oracles["stream_minhash_dedup"] != oracles["minhash_lsh"], (
        "stream_minhash_dedup oracle substitution did not match "
        "minhash_lsh's final SELECT — update the replace() pattern"
    )
    # the candidate-budget guard's minhash escape hatch: with
    # route_kwargs {num_hashes: 32, bands: 16, hasher: "md5"} the
    # routed query IS the auditable banding pipeline — same oracle
    oracles["ngram_jaccard_routed"] = oracles["minhash_lsh"]
    # containment guard's escape hatch (VERDICT r12 #3): same banded
    # candidates, DIRECTED containment verify — each undirected
    # candidate fans out to both orientations, |A∩B|/|A| on the
    # hashed shingle sets, rounded to 6 then thresholded
    oracles["ngram_containment_routed"] = oracles["minhash_lsh"].replace(
        "SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac WHERE j >= 0.6",
        """, cont AS (
              SELECT c.id_a, c.id_b,
                     round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                           / len(a.hs), 6) AS c_ab,
                     round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                           / len(b.hs), 6) AS c_ba
              FROM cand c JOIN hset a ON a.doc_id = c.id_a
                          JOIN hset b ON b.doc_id = c.id_b),
            dirp AS (
              SELECT id_a, id_b, c_ab AS containment FROM cont
              UNION ALL
              SELECT id_b AS id_a, id_a AS id_b, c_ba AS containment
              FROM cont)
            SELECT id_a, id_b, containment FROM dirp
            WHERE containment >= 0.6""",
    )
    assert (
        oracles["ngram_containment_routed"] != oracles["minhash_lsh"]
    ), (
        "ngram_containment_routed oracle substitution did not match "
        "minhash_lsh's final SELECT — update the replace() pattern"
    )

    # near-dup clustering over MinHash-LSH verified pairs (VERDICT r10
    # #1: the exact n-gram prefix join's candidate set grows
    # quadratically under fixed-vocabulary corpus growth; the banded
    # pair path is the probe-proven linear one, so the CC queries read
    # it since round 11). Pair replica from minhash_lsh, transitive
    # closure via recursive CTE, component label = min reachable id.
    oracles["dedup_components"] = (
        oracles["minhash_lsh"]
        .replace("WITH words AS", "WITH RECURSIVE words AS", 1)
        .replace(
            "SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac WHERE j >= 0.6",
            """, prs AS (SELECT id_a AS u, id_b AS v FROM jac WHERE j >= 0.6),
            edges AS (SELECT u, v FROM prs UNION ALL SELECT v, u FROM prs),
            reach(n, lab) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.n, e.v FROM reach r JOIN edges e ON e.u = r.lab)
            SELECT n AS node, min(lab) AS comp FROM reach GROUP BY n""",
        )
    )
    assert "RECURSIVE" in oracles["dedup_components"] and oracles[
        "dedup_components"
    ] != oracles["minhash_lsh"], (
        "dedup_components oracle substitution did not match minhash_lsh's "
        "CTE head / final SELECT — update the replace() patterns"
    )

    # star-contraction CC computes the same (node, min-reachable-id)
    # labeling as min-label propagation by definition — one oracle.
    oracles["dedup_components_star"] = oracles["dedup_components"]

    # Bloom-gated segment dedup (r17, the Dolma/BFF shape) keeps the
    # exact first-global-occurrence contract of dedup_segments — the
    # Bloom filter prunes the plan, never the answer — so it shares
    # segment_dedup's oracle verbatim.
    oracles["bloom_segment_dedup"] = oracles["segment_dedup"]

    # leakage-safe split (r14): the dedup_components labeling + the
    # split_assign md5 per-mille thresholds applied to the COMPONENT
    # id — every near-dup cluster lands whole in one split.
    oracles["leakage_safe_split"] = f"""
        WITH base AS (SELECT * FROM ({oracles["dedup_components"]})),
        bk AS (
          SELECT node, comp,
                 ('0x' || substr(md5('split:' || CAST(comp AS VARCHAR)),
                                 1, 8))::BIGINT % 1000 AS b
          FROM base)
        SELECT node AS doc_id, comp AS component,
               CASE WHEN b < 980 THEN 'train'
                    WHEN b < 990 THEN 'val'
                    ELSE 'test' END AS split
        FROM bk
    """

    # -- statistical evaluation operators (operators/evaluation.py) --
    # Shared determinism contract with zipf_fit / fs_em: every float
    # term entering a sum is round(x, 9) then DECIMAL(38,12)-summed
    # (order-invariant), count/rank arithmetic stays integer-exact,
    # outputs round to 6. Expression shapes mirror evaluation.py
    # token-for-token so both engines round the same doubles.

    # Dependence profile of o_orderpriority vs o_orderstatus.
    # Sparse chi2: sum over observed cells of ((o-e)^2/e - e) plus n
    # covers the never-materialized zero cells exactly.
    oracles["categorical_dependence"] = """
        WITH cells AS (
            SELECT coalesce(CAST(o_orderpriority AS VARCHAR),
                            chr(0) || 'null') AS x,
                   coalesce(CAST(o_orderstatus AS VARCHAR),
                            chr(0) || 'null') AS y,
                   CAST(count(*) AS BIGINT) AS nxy
            FROM orders GROUP BY 1, 2),
        mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx
               FROM cells GROUP BY x),
        my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny
               FROM cells GROUP BY y),
        tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells),
        hx AS (SELECT CAST(sum(CAST(round(
                        -(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
                        * ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                      AS DECIMAL(38,12))) AS DOUBLE) AS h_x,
                      CAST(count(*) AS BIGINT) AS card_x
               FROM mx, tot),
        hy AS (SELECT CAST(sum(CAST(round(
                        -(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
                        * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                      AS DECIMAL(38,12))) AS DOUBLE) AS h_y,
                      CAST(count(*) AS BIGINT) AS card_y
               FROM my, tot),
        j AS (SELECT CAST(nxy AS DOUBLE) AS o,
                     CAST(nx AS DOUBLE) AS nxd,
                     CAST(ny AS DOUBLE) AS nyd,
                     CAST(n AS DOUBLE) AS nd
              FROM cells JOIN mx USING (x) JOIN my USING (y), tot),
        st AS (SELECT
                 CAST(sum(CAST(round(
                     (o / nd) * ln(o * nd / (nxd * nyd)), 9)
                   AS DECIMAL(38,12))) AS DOUBLE) AS mi_raw,
                 CAST(sum(CAST(round(
                     (o - nxd * nyd / nd) * (o - nxd * nyd / nd)
                     / (nxd * nyd / nd) - nxd * nyd / nd, 9)
                   AS DECIMAL(38,12))) AS DOUBLE) AS chi_part
               FROM j)
        SELECT CAST(n AS BIGINT) AS n, card_x, card_y,
               round(h_x, 6) AS h_x, round(h_y, 6) AS h_y,
               round(mi_raw, 6) AS mi,
               round(CASE WHEN h_x > 0 AND h_y > 0
                          THEN mi_raw / sqrt(h_x * h_y) END, 6) AS nmi,
               round(chi_part + n, 6) AS chi2,
               CAST((card_x - 1) * (card_y - 1) AS BIGINT) AS dof,
               round(CASE WHEN least(card_x - 1, card_y - 1) > 0
                          THEN sqrt(greatest(chi_part + n, 0.0)
                                    / (n * least(card_x - 1, card_y - 1)))
                     END, 6) AS cramers_v
        FROM st, hx, hy, tot
    """

    # KS two-sample D on event values, first half-month vs second:
    # exact integer ECDF cross-products (cum_a*n_b - cum_b*n_a), only
    # the final division rounds; at_value = smallest argmax.
    oracles["ks_drift"] = """
        WITH ev AS (
            SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 'base' ELSE 'cur' END AS period,
                   CAST(value AS DOUBLE) AS v
            FROM events WHERE value IS NOT NULL),
        vc AS (SELECT v,
                      CAST(sum(CASE WHEN period = 'base'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS na_s,
                      CAST(sum(CASE WHEN period = 'cur'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS nb_s
               FROM ev GROUP BY v),
        cum AS (SELECT v,
                       sum(na_s) OVER (ORDER BY v) AS ca,
                       sum(nb_s) OVER (ORDER BY v) AS cb
                FROM vc),
        tot AS (SELECT CAST(sum(na_s) AS BIGINT) AS na,
                       CAST(sum(nb_s) AS BIGINT) AS nb FROM vc),
        gaps AS (SELECT v,
                        abs(CAST(ca AS HUGEINT) * nb
                            - CAST(cb AS HUGEINT) * na) AS d,
                        na, nb
                 FROM cum, tot),
        md AS (SELECT max(d) AS mdv FROM gaps)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               round(CAST(mdv AS DOUBLE)
                     / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
                 AS d_stat,
               round(min(v), 6) AS at_value
        FROM gaps, md WHERE d = mdv GROUP BY na, nb, mdv
    """

    # Mann-Whitney AUC of embedding[0] scoring label < 5: midrank sum
    # per distinct score via 2*R = sum p_s*(2*B_s + c_s + 1), exact
    # integer rank arithmetic.
    oracles["auc_eval"] = """
        WITH sc AS (
            SELECT CAST(embedding[1] AS DOUBLE) AS s,
                   CAST(CASE WHEN label < 5 THEN 1 ELSE 0 END
                        AS BIGINT) AS l
            FROM embeddings
            WHERE label IS NOT NULL AND embedding[1] IS NOT NULL),
        g AS (SELECT s, CAST(sum(l) AS BIGINT) AS pos_s,
                     CAST(count(*) AS BIGINT) AS n_s
              FROM sc GROUP BY s),
        cum AS (SELECT pos_s, n_s,
                       CAST(sum(n_s) OVER (ORDER BY s) AS BIGINT) AS cn
                FROM g),
        agg AS (SELECT sum(CAST(pos_s AS HUGEINT)
                           * (2 * CAST(cn - n_s AS HUGEINT) + n_s + 1))
                         AS r2,
                       CAST(sum(pos_s) AS HUGEINT) AS np,
                       CAST(sum(n_s) - sum(pos_s) AS HUGEINT) AS nn
                FROM cum)
        SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               round(CASE WHEN np > 0 AND nn > 0 THEN
                   CAST(r2 - np * (np + 1) AS DOUBLE)
                   / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))
               END, 6) AS auc
        FROM agg
    """

    # Reliability bins + ECE terms for the md5-derived synthetic
    # classifier (content-free hash randomness, split_assign contract);
    # 10 fixed-width bins, decimal-summed mean probabilities.
    oracles["calibration_bins"] = """
        WITH scored AS (
            SELECT (('0x' || substr(md5('cal:p:'
                       || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 1000000) / 1000000.0 AS prob,
                   CASE WHEN ('0x' || substr(md5('cal:l:'
                              || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                             % 1000000
                           < ('0x' || substr(md5('cal:p:'
                              || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                             % 1000000
                        THEN 1 ELSE 0 END AS y
            FROM documents),
        b AS (SELECT CAST(least(greatest(
                       CAST(floor(prob * 10) AS BIGINT), 0), 9) AS INT)
                       AS bin,
                     prob, y
              FROM scored
              WHERE prob IS NOT NULL AND y IS NOT NULL),
        per AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                       sum(CAST(round(prob, 9) AS DECIMAL(38,12))) AS sp,
                       CAST(sum(y) AS BIGINT) AS pos
                FROM b GROUP BY bin),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM per)
        SELECT bin, n,
               round(CAST(sp AS DOUBLE) / n, 6) AS mean_prob,
               round(CAST(pos AS DOUBLE) / n, 6) AS frac_pos,
               round(CAST(pos AS DOUBLE) / n
                     - CAST(sp AS DOUBLE) / n, 6) AS gap,
               round(CAST(n AS DOUBLE) / t
                     * abs(CAST(pos AS DOUBLE) / n
                           - CAST(sp AS DOUBLE) / n), 6) AS ece_term
        FROM per, tot ORDER BY bin
    """

    # Kish ESS / weight-concentration diagnostics per document source
    # with n_chars as the sampling weight; round-9 decimal moment sums.
    oracles["weight_diagnostics"] = """
        WITH w AS (
            SELECT source AS grp, CAST(n_chars AS DOUBLE) AS wv
            FROM documents
            WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0),
        g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(round(wv, 9) AS DECIMAL(38,12)))
                          AS DOUBLE) AS sw,
                     CAST(sum(CAST(round(wv * wv, 9) AS DECIMAL(38,12)))
                          AS DOUBLE) AS sww,
                     max(wv) AS mw
              FROM w GROUP BY grp)
        SELECT grp AS "group", n,
               round(sw, 6) AS sum_w,
               round(sw * sw / sww, 6) AS ess,
               round(sw * sw / sww / CAST(n AS DOUBLE), 6) AS ess_ratio,
               round(mw / sw, 6) AS max_w_frac,
               round(sqrt(greatest(
                   CAST(n AS DOUBLE) * sww / (sw * sw) - 1, 0.0)), 6) AS cv
        FROM g
    """

    # r15 (VERDICT r14 #4): the sums="int64" engine of
    # grouped_normal_equations is value-IDENTICAL to the decimal path
    # by construction (scaled bigint sums divided back as decimal
    # before the one double conversion), so the fast path shares the
    # decimal path's oracle verbatim — a differing hash would mean the
    # bit-identity contract broke.
    oracles["multiple_regression_fast"] = oracles["multiple_regression"]
    return oracles
