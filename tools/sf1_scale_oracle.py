#!/usr/bin/env python3
"""Scale-oracle for the text-dedup family at sf1 (10x replicated corpus).

The sf1 corpus is ScaleUp's EXACT x10 replication of sf0.1: replica r
copies every document verbatim under doc_id + r*10^8. For text-dedup
operators that replication has closed-form consequences, so the expected
sf1 results are derivable from the (feasible) sf0.1 DuckDB oracle results
plus the sf0.1 documents table — an INDEPENDENT oracle at a scale where
the exhaustive O(n^2) replay is intractable (the direct DuckDB compare at
sf1 ran >40 minutes and died):

  q22  jac(X_r, Y_s) = jac(X, Y) (Jaccard depends only on the shingle
       sets) and identical copies have jac 1.0 — expected pairs = every
       (r, s) combination of each sf0.1 pair, plus all C(10,2) self-copy
       pairs of every doc with >= 1 shingle (>= 2 space-split tokens).
  q23  simhash prints are text-deterministic: same cross structure, self
       pairs at hamming 0, over ALL docs (prints exist for every text).
  q61/q99  component(X_r) = sf0.1 component(X) (copy 0 keeps the minimum
       id); zero-shingle docs never pair, so each copy stays a singleton.
  q82  every w-token window now occurs >= 10 times corpus-wide, so every
       doc with >= w tokens collapses to ONE maximal span covering the
       whole document (start 0, length n_tokens, text = tokens re-joined).
  q107 line dedup elects the minimum (doc_id, idx) occurrence and every
       replica-0 id sorts below every replica-r>0 id, so replica 0's
       rows equal the sf0.1 result exactly and every replica-r>0 doc
       loses ALL its lines (n_kept=0, empty text).
  q110 CDC chunk stats: replicas chunk identically (boundaries are
       content-defined), so totals scale x10 while distinct counts are
       unchanged and dedup_ratio becomes distinct/(10*total).
  q109 overlap matrix is replication-INVARIANT: copies add no new
       distinct shingles to any source, so the expected sf1 output is
       the base result verbatim.
  q117 chunk-store admission: the SHIFT (10^8) is even, so replica ids
       keep their parity — the stored (even) side's distinct-chunk set
       is unchanged by replication, and every odd replica doc prices
       exactly like its base twin: expected = base rows x10 under id
       shifts.
  q81  group-first SemDeDup is replication-INVARIANT: replicas carry
       bit-identical vectors, the exact-vector collapse maps every copy
       onto its replica-0 twin, and the canonical (min id, component)
       output equals the base result verbatim.
  q121/q122 BPE: replication multiplies every word count and every
       adjacent-pair count by exactly 10, so the capped dict order and
       every argmax (count DESC, pair ASC) are UNCHANGED -> the learned
       merges are identical and every replica encodes exactly like its
       base twin: expected = base rows x10 under id shifts (q122's
       even-train/odd-encode parity survives the even 10^8 shift).
  q134 stratified-exact: the Hamilton allocation is replication-
       invariant ((10n*S) div (10N) = (n*S) div N, remainder order
       unchanged) and the direct oracle replay over the replicated view
       is tractable (selection-family), so the expected result checks
       both the allocation algebra and the hash-order selection at 10x.
  q123 funnel: per-doc gate flags are text-deterministic (x10 counts),
       but the exact-canonical stage keeps only replica-0 survivors:
       n_kept is UNCHANGED while every other stage count scales x10 -
       the funnel visibly tightens under duplication, which is the
       operator's whole point.
  q103/q87/q91 (selection family): no derivation needed — the direct
       oracle replay IS tractable here (window/threshold SQL, no O(n^2)
       closure), so the expected result is the base oracle SQL run
       verbatim over the replicated documents view, checking exact rank
       cuts and quantized keep thresholds at 10x cardinality/mass.
  q135/q136/q137 (graph family over the label-blocked cosine graph):
       replicas carry bit-identical vectors, so every replica PAIR of a
       vertex is itself an edge (cosine(v,v)=1) — the sf1 graph is the
       10x BLOW-UP of the base graph (each vertex becomes a 10-clique,
       each base edge a complete bipartite K_{10,10}), NOT ten disjoint
       copies. Closed forms per base vertex x with base degree d and
       base triangle count t, for every replica x_r:
         degree'(x_r) = 10d + 9
         tri'(x_r)    = 100t + 135d + 36
           (100 per base triangle; 45d same-neighbor replica pairs;
            90d neighbor-replica x own-replica pairs; C(9,2)=36 own)
         coeff'       = tri' / C(degree', 2)
       PageRank is replica-symmetric, so the integer fixed-point
       recursion closes over BASE vertices with replica multiplicities:
         n' = 10 |V|,  base' = scale // n'
         S(x) = sum_{y~x} 10*(r(y) // degp(y)) + 9*(r(x) // degp(x))
         r'(x) = (15 base') // 100 + (85 S(x)) // 100
       — every step integer, replayed 5 unrolled rounds, exact units.
       Isolated base vertices join the graph at sf1 through their own
       replica clique (d=0 rows: degree' 9, tri' 36).

This is exactly the regime the bucket caps (maxBucketSize) were built
for: LSH/chunk buckets are 10x hotter, and any silent cap-fire or
blocked-join recall loss diverges from the algebra and FAILS here.

  q145 adaptive filtered probing retrains its coarse codebook on the
       REPLICATED corpus (whose candidate set also gains the replicas of
       the base queries), so no id-shift algebra from base results exists.
       Instead the DIRECT replay is tractable at this scale (10 queries x
       ~20k candidates): the sf1 Verify dump's own oracle_sql.json entry —
       the full histogram -> ranked cumulative survivors -> per-query depth
       -> filtered top-k decision rendered from the sf1-captured centroid
       literals — runs in DuckDB against the sf1 embeddings (pass sf1Dir).
       Independence is the round gate's own: DuckDB recomputes assignment,
       histograms, both regimes' range/equality survivor sums, and the
       widened top-k from literals; only the trained centroids are shared.

Usage:
  python3 tools/sf1_scale_oracle.py <sf01Dir> <sf01VerifyOut> <sf1VerifyOut> [out.json] [sf1Dir]
where <sf01VerifyOut> is a Verify dump at sf0.1 containing oracle_sql.json
(for the base q22/q23/q61 SQL) and <sf1VerifyOut> contains the engine's
sf1 parquet dumps to be judged. <sf1Dir> (the replicated corpus) enables
the q145 direct replay; without it q145 is skipped with a note.
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, "tools")
from compare_oracle import table_rows  # noqa: E402

SHIFT = 100000000
# Replication factor: 10 for the standard sf1/sf10x tiers; override with
# SCALE_FACTOR for deeper decades (e.g. 100 for the sf10-equivalent tier —
# ids stay < 10^10, well inside int64). All the closed-form algebra below
# is factor-parametric:
#   degree'(x_r) = F d + (F-1)
#   tri'(x_r)    = F^2 t + (3 F (F-1) / 2) d + C(F-1, 2)
#     (F^2 per base triangle; C(F,2) same-neighbor replica pairs plus
#      F(F-1) neighbor-replica x own-replica pairs = 3F(F-1)/2 per base
#      edge; C(F-1,2) own-replica pairs)
#   pagerank: S(x) = sum_{y~x} F (r(y) // degp(y)) + (F-1)(r(x) // degp(x))
# At F=10 these reproduce the original 100/135/36 and 10d+9 constants.
import os as _os
FACTOR = int(_os.environ.get("SCALE_FACTOR", "10"))
TRI_EDGE = 3 * FACTOR * (FACTOR - 1) // 2       # 135 at F=10
TRI_OWN = (FACTOR - 1) * (FACTOR - 2) // 2      # 36 at F=10


def main():
    sf01_dir, sf01_out, sf1_out = sys.argv[1], sys.argv[2], sys.argv[3]
    report_path = sys.argv[4] if len(sys.argv) > 4 else "CORRECTNESS_sf1.json"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf01_dir}/documents.parquet')")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf01_dir}/embeddings.parquet')")
    oracle = json.load(open(f"{sf01_out}/oracle_sql.json"))

    # ---- base results: the DuckDB oracle replay by default (fully
    # independent), or — with BASE_FROM_ENGINE=1 — the base dir's engine
    # parquet dumps (a SELF-consistency check: the engine's small-SF
    # results are oracle-verified every round, and the replication algebra
    # then tests whether the big-SF run's guards silently diverged).
    base_from_engine = os.environ.get("BASE_FROM_ENGINE") == "1"
    # Build ONLY the base tables the judged subset needs: a SCALE_QUERIES
    # run (e.g. the graph family) must not require the base dump to carry
    # every other family's oracle/dumps — that coupling once made the
    # scripted tier die on a fresh machine.
    only_env = os.environ.get("SCALE_QUERIES")
    only_pats = [p for p in only_env.split(",") if p] if only_env else None

    def judged(*prefixes):
        return only_pats is None or any(
            q.startswith(p) for q in prefixes for p in only_pats)

    base_needed = {  # base table -> judged queries that read it
        "q22_minhash_neardup": ("q22",), "q23_simhash_hamming": ("q23",),
        "q61_dedup_clusters": ("q61", "q99"), "q107_line_dedup": ("q107",),
        "q110_cdc_chunks": ("q110",), "q109_overlap_matrix": ("q109",),
        "q117_chunk_store": ("q117",), "q81_semdedup": ("q81",),
        "q121_bpe_encode": ("q121",), "q122_tokenizer_index": ("q122",),
        "q123_quality_funnel": ("q123",),
        "q136_clustering_coeff": ("q135", "q136"),
        "q144_lang_id_ngram": ("q144",),
    }
    for q, consumers in base_needed.items():
        if not judged(*consumers):
            continue
        short = q.split("_")[0]
        if base_from_engine:
            con.sql(f"CREATE TABLE base_{short} AS "
                    f"SELECT * FROM read_parquet('{sf01_out}/{q}/*.parquet')")
        else:
            con.sql(f"CREATE TABLE base_{short} AS {oracle[q]}")

    con.sql(f"CREATE TABLE reps AS SELECT unnest(range({FACTOR})) AS r")

    expected = {}
    expected["q22_minhash_neardup"] = f"""
      WITH cross_pairs AS (
        SELECT b.id_a + r.r * {SHIFT} AS ia, b.id_b + s.r * {SHIFT} AS ib, b.jac
        FROM base_q22 b, reps r, reps s),
      self_pairs AS (
        SELECT d.doc_id + r.r * {SHIFT} AS ia, d.doc_id + s.r * {SHIFT} AS ib, 1.0 AS jac
        FROM documents d, reps r, reps s
        WHERE r.r < s.r AND len(string_split(d.text, ' ')) >= 2)
      SELECT LEAST(ia, ib) AS id_a, GREATEST(ia, ib) AS id_b, jac FROM cross_pairs
      UNION ALL SELECT ia, ib, jac FROM self_pairs"""

    expected["q23_simhash_hamming"] = f"""
      WITH cross_pairs AS (
        SELECT b.id_a + r.r * {SHIFT} AS ia, b.id_b + s.r * {SHIFT} AS ib, b.hamming
        FROM base_q23 b, reps r, reps s),
      self_pairs AS (
        SELECT d.doc_id + r.r * {SHIFT} AS ia, d.doc_id + s.r * {SHIFT} AS ib,
          CAST(0 AS INT) AS hamming
        FROM documents d, reps r, reps s WHERE r.r < s.r)
      SELECT LEAST(ia, ib) AS id_a, GREATEST(ia, ib) AS id_b, CAST(hamming AS INT) AS hamming
      FROM cross_pairs
      UNION ALL SELECT ia, ib, hamming FROM self_pairs"""

    cluster_sql = f"""
      SELECT b.id + r.r * {SHIFT} AS id,
        CASE WHEN len(string_split(d.text, ' ')) >= 2 THEN b.component
             ELSE b.id + r.r * {SHIFT} END AS component,
        CASE WHEN len(string_split(d.text, ' ')) >= 2
             THEN b.component = b.id + r.r * {SHIFT}
             ELSE TRUE END AS is_canonical
      FROM base_q61 b JOIN documents d ON d.doc_id = b.id, reps r"""
    expected["q61_dedup_clusters"] = cluster_sql
    expected["q99_neardup_groups"] = cluster_sql

    expected["q82_maximal_spans"] = f"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
        FROM documents)
      SELECT t.doc_id + r.r * {SHIFT} AS doc_id,
        CAST(0 AS INT) AS span_start,
        CAST(len(ts) AS INT) AS span_tokens,
        array_to_string(ts, ' ') AS span_text
      FROM toks t, reps r WHERE len(ts) >= 8"""

    expected["q107_line_dedup"] = f"""
      SELECT b.doc_id + r.r * {SHIFT} AS doc_id,
        CASE WHEN r.r = 0 THEN b.n_lines_kept ELSE 0 END AS n_lines_kept,
        CASE WHEN r.r = 0 THEN b.n_lines_dropped
             ELSE b.n_lines_kept + b.n_lines_dropped END AS n_lines_dropped,
        CASE WHEN r.r = 0 THEN b.text_dedup ELSE '' END AS text_dedup
      FROM base_q107 b, reps r"""

    expected["q110_cdc_chunks"] = f"""
      SELECT b.n_chunks * {FACTOR} AS n_chunks, b.n_distinct_chunks,
        b.total_chars * {FACTOR} AS total_chars, b.distinct_chars,
        ROUND(CAST(b.distinct_chars AS DOUBLE) / (b.total_chars * {FACTOR}), 6)
          + 0.0 AS dedup_ratio
      FROM base_q110 b"""

    expected["q109_overlap_matrix"] = "SELECT * FROM base_q109"

    # q144 language ID is a pure per-document projection: every replica
    # carries the same text, so it gets the base row's (script, lang_pred)
    # under the id shift — exercises the trigram batteries and the
    # single-pass script counter at 10x cardinality.
    expected["q144_lang_id_ngram"] = f"""
      SELECT b.doc_id + r.r * {SHIFT} AS doc_id, b.script, b.lang_pred
      FROM base_q144 b, reps r"""

    # q81 (group-first SemDeDup) is replication-INVARIANT like q109:
    # replicas carry bit-identical vectors, so the exact-vector collapse
    # maps every copy onto its replica-0 twin, rep-level edges (cosine
    # depends only on the vectors) and components are unchanged, and the
    # canonical output — (min id, component) rows — is the base result
    # verbatim (replica-0 ids sort below every shifted id).
    expected["q81_semdedup"] = "SELECT * FROM base_q81"

    # ---- selection family: the direct oracle replay IS tractable here
    # (window/threshold SQL over the replicated 10x row set — no O(n^2)
    # recursive closure), so the expected result is the base oracle SQL
    # run verbatim against the replicated documents view: fully
    # independent, and it checks the engine's rank cuts / quantized
    # thresholds at 10x cardinality and 10x source mass.
    con.sql(f"CREATE VIEW documents_x10 AS "
            f"SELECT doc_id + r.r * {SHIFT} AS doc_id, "
            f"COLUMNS(c -> c <> 'doc_id') FROM documents, reps r")
    for q in ("q103_quantile_buckets", "q87_temperature_mix", "q91_budget_select",
              "q134_stratified_exact"):
        if not judged(q.split("_")[0]):
            continue
        import re as _re
        expected[q] = _re.sub(r"\bdocuments\b", "documents_x10", oracle[q])

    expected["q121_bpe_encode"] = f"""
      SELECT b.id + r.r * {SHIFT} AS id, b.bpe_tokens, b.base_chars,
        b.encoded_prefix
      FROM base_q121 b, reps r"""

    expected["q122_tokenizer_index"] = f"""
      SELECT b.id + r.r * {SHIFT} AS id, b.bpe_tokens, b.base_chars,
        b.encoded_prefix
      FROM base_q122 b, reps r"""

    expected["q123_quality_funnel"] = f"""
      SELECT b.source, b.n_docs * {FACTOR} AS n_docs,
        b.n_len_ok * {FACTOR} AS n_len_ok,
        b.n_gopher_ok * {FACTOR} AS n_gopher_ok,
        b.n_rep_ok * {FACTOR} AS n_rep_ok, b.n_kept,
        ROUND(CAST(b.n_kept AS DOUBLE) / (b.n_docs * {FACTOR}), 4) + 0.0 AS kept_frac
      FROM base_q123 b"""

    expected["q117_chunk_store"] = f"""
      SELECT b.doc_id + r.r * {SHIFT} AS doc_id, b.n_chunks, b.n_new_chunks,
        b.new_bytes, b.dup_bytes
      FROM base_q117 b, reps r"""

    if judged("q135", "q136", "q137"):
        # ---- graph family: the sf1 graph is the 10x BLOW-UP of the base
        # label-blocked cosine graph (see module docstring). `gaug` carries
        # every base vertex that self-connects (nonzero norm -> replica-clique
        # edges exist) with its base degree/triangles (0 for base-isolated).
        # Skipped entirely when the judged subset has no graph query (the
        # tables below depend on base_q136, which is only built when needed).
        con.sql("""CREATE TABLE gverts AS
          SELECT vec_id AS id FROM embeddings
          WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0""")
        con.sql("""CREATE TABLE gaug AS
          SELECT v.id, COALESCE(b.degree, 0) AS deg, COALESCE(b.n_tri, 0) AS tri
          FROM gverts v LEFT JOIN base_q136 b ON b.id = v.id""")

        expected["q135_triangles"] = f"""
          SELECT a.id + r.r * {SHIFT} AS id,
            CAST({FACTOR * FACTOR}::BIGINT * a.tri + {TRI_EDGE} * a.deg
              + {TRI_OWN} AS BIGINT) AS n_tri
          FROM gaug a, reps r"""

        expected["q136_clustering_coeff"] = f"""
          SELECT a.id + r.r * {SHIFT} AS id,
            CAST({FACTOR} * a.deg + {FACTOR - 1} AS BIGINT) AS degree,
            CAST({FACTOR * FACTOR}::BIGINT * a.tri + {TRI_EDGE} * a.deg
              + {TRI_OWN} AS BIGINT) AS n_tri,
            ROUND(CAST({FACTOR * FACTOR}::BIGINT * a.tri + {TRI_EDGE} * a.deg
                + {TRI_OWN} AS DOUBLE)
              / GREATEST((({FACTOR} * a.deg + {FACTOR - 1})
                * ({FACTOR} * a.deg + {FACTOR - 2})) // 2, 1), 6)
              + 0.0 AS coeff
          FROM gaug a, reps r"""

        # PageRank: replica-symmetric integer recursion over base vertices.
        # Base edges re-derived independently in DuckDB (same construction as
        # the q137 small-SF oracle); 5 rounds unrolled, all integer ops.
        con.sql("""CREATE TABLE gedges AS
          SELECT a.vec_id AS u, b.vec_id AS v
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.15""")
        con.sql("""CREATE TABLE gadj AS
          SELECT u, v AS w FROM gedges UNION ALL SELECT v, u FROM gedges""")
        con.sql(f"""CREATE TABLE gdegp AS
          SELECT a.id, CAST({FACTOR} * COALESCE(d.bd, 0) + {FACTOR - 1} AS BIGINT) AS degp
          FROM gaug a LEFT JOIN (
            SELECT u AS id, COUNT(*) AS bd FROM gadj GROUP BY u) d ON d.id = a.id""")
        scale_fp = 1000000000000
        nprime = FACTOR * con.sql("SELECT COUNT(*) FROM gverts").fetchone()[0]
        basep = scale_fp // nprime if nprime else 0
        pr_ctes = [f"pr0 AS MATERIALIZED (SELECT id, CAST({basep} AS BIGINT) AS r FROM gdegp)"]
        for t in range(1, 6):
            pr_ctes.append(f"""c{t} AS (
              SELECT j.u AS id, SUM({FACTOR} * (rp.r // dp.degp)) AS s
              FROM gadj j JOIN pr{t - 1} rp ON rp.id = j.w
              JOIN gdegp dp ON dp.id = j.w GROUP BY j.u)""")
            pr_ctes.append(f"""pr{t} AS MATERIALIZED (
              SELECT a.id,
                CAST((15 * CAST({basep} AS BIGINT)) // 100
                  + (85 * (COALESCE(c.s, 0) + {FACTOR - 1} * (rp.r // a.degp))) // 100
                  AS BIGINT) AS r
              FROM gdegp a JOIN pr{t - 1} rp ON rp.id = a.id
              LEFT JOIN c{t} c ON c.id = a.id)""")
        expected["q137_pagerank"] = (
            "WITH " + ",\n".join(pr_ctes) + f"""
          SELECT p.id + r.r * {SHIFT} AS id, p.r AS rank_fp
          FROM pr5 p, reps r""")

    # ---- direct-replay family (q145): the sf1 run's own captured-centroid
    # oracle SQL against the sf1 corpus — see module docstring.
    sf1_dir = sys.argv[5] if len(sys.argv) > 5 else None
    direct_replay = {}
    if sf1_dir:
        sf1_oracle = json.load(open(f"{sf1_out}/oracle_sql.json"))
        # q146 (multi-field estimation) retrains on the scaled corpus like
        # q145, so it joins the same direct-replay family: the scaled run's
        # own captured-centroid oracle — two per-field histograms, the
        # min/drop/sum estimate composition, depth, widened top-k — runs in
        # DuckDB against the scaled embeddings end to end.
        for dq in ("q145_adaptive_filtered", "q146_multifield_adaptive"):
            if dq in sf1_oracle:
                direct_replay[dq] = sf1_oracle[dq]
            else:
                print(f"NOTE {dq} missing from sf1 oracle_sql.json — skipped")
    else:
        print("NOTE no sf1Dir argument — q145/q146 direct replay skipped")

    # SCALE_QUERIES=q107,q110,... judges only that subset — the deeper
    # tiers (SCALE_FACTOR=100) run the replication-invariant/linear body
    # and skip the pair-materializing dedup family, whose expected-side
    # row count grows with C(F,2) per duplicate class (28M rows at F=100:
    # a compare-harness cost, not an engine one).
    only = os.environ.get("SCALE_QUERIES")
    if only:
        pats = [p for p in only.split(",") if p]
        expected = {k: v for k, v in expected.items()
                    if any(k.startswith(p) for p in pats)}
        direct_replay = {k: v for k, v in direct_replay.items()
                         if any(k.startswith(p) for p in pats)}

    report = {}
    n_pass = n_fail = 0
    if direct_replay:
        con_sf1 = duckdb.connect()
        # ScaleUp writes Spark directory-style tables (embeddings.parquet/
        # part-*.parquet); plain testdata ships single files
        emb = f"{sf1_dir}/embeddings.parquet"
        emb_pat = f"{emb}/*.parquet" if os.path.isdir(emb) else emb
        con_sf1.sql(f"CREATE VIEW embeddings AS "
                    f"SELECT * FROM read_parquet('{emb_pat}')")
        for name, sql in direct_replay.items():
            entry = {"rows_match": False, "schema_match": False, "hash_match": False,
                     "spark_rows": None, "oracle_rows": None, "err": None,
                     "oracle": "sf1-direct-replay-captured-centroids"}
            try:
                scols, srows = table_rows(
                    con_sf1.sql(f"SELECT * FROM read_parquet('{sf1_out}/{name}/*.parquet')"))
                ocols, orows = table_rows(con_sf1.sql(sql))
                entry["spark_rows"], entry["oracle_rows"] = len(srows), len(orows)
                entry["schema_match"] = scols == ocols
                entry["rows_match"] = len(srows) == len(orows)
                entry["hash_match"] = srows == orows
                if not entry["schema_match"]:
                    entry["err"] = f"columns spark={scols} expected={ocols}"
                elif not entry["hash_match"] and entry["rows_match"]:
                    diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
                    entry["err"] = (f"first mismatch row {diff}: "
                                    f"spark={srows[diff]} expected={orows[diff]}")
            except Exception as e:
                entry["err"] = str(e)
            ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
            n_pass += ok
            n_fail += not ok
            print(("PASS" if ok else "FAIL") +
                  f" {name} (spark={entry['spark_rows']} expected={entry['oracle_rows']})" +
                  ("" if ok else f": {entry['err']}"))
            report[name] = entry

    for name, sql in expected.items():
        entry = {"rows_match": False, "schema_match": False, "hash_match": False,
                 "spark_rows": None, "oracle_rows": None, "err": None,
                 "oracle": "sf1-replication-algebra-from-sf0.1"}
        try:
            scols, srows = table_rows(
                con.sql(f"SELECT * FROM read_parquet('{sf1_out}/{name}/*.parquet')"))
            ocols, orows = table_rows(con.sql(sql))
            entry["spark_rows"], entry["oracle_rows"] = len(srows), len(orows)
            entry["schema_match"] = scols == ocols
            entry["rows_match"] = len(srows) == len(orows)
            entry["hash_match"] = srows == orows
            if not entry["schema_match"]:
                entry["err"] = f"columns spark={scols} expected={ocols}"
            elif not entry["hash_match"] and entry["rows_match"]:
                diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
                entry["err"] = f"first mismatch row {diff}: spark={srows[diff]} expected={orows[diff]}"
        except Exception as e:
            entry["err"] = str(e)
        ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        n_pass += ok
        n_fail += not ok
        print(("PASS" if ok else "FAIL") +
              f" {name} (spark={entry['spark_rows']} expected={entry['oracle_rows']})" +
              ("" if ok else f": {entry['err']}"))
        report[name] = entry

    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"== {n_pass} pass, {n_fail} fail -> {report_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
