#!/usr/bin/env python3
"""Sampled LSH-recall independence check (ADVICE r17 #1).

The pair-consuming oracles (pl_p3/p4/p5, pl_g1/g2, pl_p6, st17/18)
mirror the engine's own banded-LSH candidate generation, so at the
scales where the quadratic brute oracle cannot run (sf1+), a recall gap
shared by engine and mirror would pass both sides undetected. This tool
exercises the "banding finds every >=minJaccard pair on this corpus"
claim AT that scale, without the quadratic blowup: it brute-verifies
every pair INVOLVING a deterministic ~1% doc sample (cost |S|*N, linear
in the corpus) and asserts each one appears in the engine's emitted
pair list (which the mirror equals, by the hash gates).

Usage:
  python3 tools/mirror_recall_check.py <engine_pairs_dir> <sf_dir> \
      [--mod 97] [--res 13] [--min-jaccard 0.7]

<engine_pairs_dir>: a graft.Verify output dir for pl_d2_minhash_pairs
(parquet with doc1/doc2/jaccard columns). Exit 1 if any sampled true
pair is missing from it.
"""
import argparse, glob, os, sys

# EXACTLY PipelineQueries.shinglesSql / truthPairsSqlFor's shingle set
# (raw single-space split, 3-token shingles, distinct)
TOKS = "string_split(text, ' ')"
SHINGLES = (f"list_distinct(list_transform(range(0, len({TOKS}) - 2), "
            f"i -> {TOKS}[i+1] || '_' || {TOKS}[i+2] || '_' || {TOKS}[i+3]))")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("engine_pairs_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--mod", type=int, default=97)
    ap.add_argument("--res", type=int, default=13)
    ap.add_argument("--min-jaccard", type=float, default=0.7)
    a = ap.parse_args()
    pq = sorted(glob.glob(os.path.join(a.engine_pairs_dir, "*.parquet")))
    assert pq, f"no parquet under {a.engine_pairs_dir}"
    import duckdb
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT * FROM read_parquet('{a.sf_dir}/documents.parquet')""")
    con.execute(f"""CREATE VIEW engine_pairs AS
        SELECT * FROM read_parquet({pq!r})""")
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_samp = con.execute(
        f"SELECT count(*) FROM documents WHERE doc_id % {a.mod} = {a.res}"
    ).fetchone()[0]
    # brute ground truth restricted to pairs touching the sample:
    # |S| x N shingle intersections, linear in the corpus
    rows = con.execute(f"""
        WITH sh AS (SELECT doc_id, {SHINGLES} AS s FROM documents),
        samp AS (SELECT * FROM sh WHERE doc_id % {a.mod} = {a.res}),
        cand AS (
          SELECT least(a.doc_id, b.doc_id) AS doc1,
                 greatest(a.doc_id, b.doc_id) AS doc2,
                 CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
                 CAST(len(a.s) AS BIGINT) AS n1,
                 CAST(len(b.s) AS BIGINT) AS n2
          FROM samp a JOIN sh b ON a.doc_id <> b.doc_id),
        truth AS (
          SELECT DISTINCT doc1, doc2
          FROM cand
          WHERE n_inter::DOUBLE / (n1 + n2 - n_inter) >= {a.min_jaccard})
        SELECT
          (SELECT count(*) FROM truth) AS n_truth,
          (SELECT count(*) FROM truth t
            WHERE NOT EXISTS (SELECT 1 FROM engine_pairs e
              WHERE e.doc1 = t.doc1 AND e.doc2 = t.doc2)) AS n_missing
    """).fetchone()
    n_truth, n_missing = rows
    print(f"[mirror-recall] sf={a.sf_dir} docs={n_docs} "
          f"sample={n_samp} (doc_id % {a.mod} == {a.res}) "
          f"sampled true pairs >= {a.min_jaccard}: {n_truth}, "
          f"missing from engine/mirror: {n_missing}")
    if n_missing:
        miss = con.execute("""
          WITH sh AS (SELECT doc_id, """ + SHINGLES + f""" AS s FROM documents),
          samp AS (SELECT * FROM sh WHERE doc_id % {a.mod} = {a.res}),
          cand AS (
            SELECT least(a.doc_id, b.doc_id) AS doc1,
                   greatest(a.doc_id, b.doc_id) AS doc2,
                   CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
                   CAST(len(a.s) AS BIGINT) AS n1,
                   CAST(len(b.s) AS BIGINT) AS n2
            FROM samp a JOIN sh b ON a.doc_id <> b.doc_id),
          truth AS (
            SELECT DISTINCT doc1, doc2 FROM cand
            WHERE n_inter::DOUBLE / (n1 + n2 - n_inter) >= {a.min_jaccard})
          SELECT * FROM truth t
          WHERE NOT EXISTS (SELECT 1 FROM engine_pairs e
            WHERE e.doc1 = t.doc1 AND e.doc2 = t.doc2) LIMIT 20
        """).df()
        print(miss.to_string())
    sys.exit(1 if n_missing else 0)


if __name__ == "__main__":
    main()
