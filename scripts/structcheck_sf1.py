#!/usr/bin/env python3
"""Structural verification for the three sweep queries whose DuckDB
twins are single-node-infeasible at sf >= 1 (semantic_clusters,
semantic_dedup, winnow_overlap — recursive-CTE / pair-self-join
oracles that exceeded 129 GB RSS; see SURVEY section 7f round 7).

The gen_sf.py corpus is MULT disjoint jittered copies of sf0.1, so
each query has EXACT invariants of the generator that need no oracle:

  - winnow_overlap: copies of one source doc are textually identical,
    so every source with surviving fingerprints must form its full
    C(MULT,2) intra-copy pair clique with UNIFORM shared_fps.
  - semantic_clusters: the MULT jittered copies of a source vector
    (dim-0 jitter 0.001 per copy) must land in ONE cluster.
  - semantic_dedup: SemDeDup keeps one representative per near-dup
    group — sources represented in the kept set should keep exactly
    one vector (a small boundary tolerance is correct SemDeDup
    semantics when copies straddle a cell's cosine pruning edge).

Usage: python3 scripts/structcheck_sf1.py <baseDir> <verifyOutDir> [mult]

baseDir is the SOURCE corpus the sf sweep replicated (the generator's
input, normally /root/testdata/sf0.1) — the id-modulus invariants are
derived from ITS cardinalities, so passing the wrong base computes the
wrong "copies of one source" grouping. Exits nonzero on any violated
invariant.
"""
import sys
import duckdb

def main(base_dir, out_dir, mult=10):
    con = duckdb.connect()
    src = base_dir
    kd = con.execute(f"SELECT max(doc_id)+1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
    kv = con.execute(f"SELECT max(vec_id)+1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]
    npairs = mult * (mult - 1) // 2
    fails = 0

    # -- winnow_overlap: full intra-copy cliques, uniform shared_fps --
    w = con.execute(f"""
      WITH intra AS (
        SELECT doc_a % {kd} AS orig, shared_fps
        FROM read_parquet('{out_dir}/winnow_overlap/*.parquet')
        WHERE doc_a % {kd} = doc_b % {kd}),
      per AS (SELECT orig, count(*) AS c, count(DISTINCT shared_fps) AS dfp
              FROM intra GROUP BY 1)
      SELECT count(*) FILTER (c = {npairs} AND dfp = 1) AS exact,
             count(*) AS sources FROM per""").fetchone()
    print(f"winnow_overlap: {w[0]}/{w[1]} sources form the exact "
          f"{npairs}-pair uniform clique")
    if w[0] != w[1] or w[1] == 0:
        fails += 1

    # -- semantic_clusters: all copies of a source in one cluster --
    s = con.execute(f"""
      SELECT count(*) FILTER (dc = 1) AS coherent, count(*) AS sources
      FROM (SELECT vec_id % {kv} AS orig, count(DISTINCT cluster_id) AS dc,
                   count(*) AS n
            FROM read_parquet('{out_dir}/semantic_clusters/*.parquet')
            GROUP BY 1)""").fetchone()
    print(f"semantic_clusters: {s[0]}/{s[1]} sources coherent (one cluster)")
    if s[0] != s[1] or s[1] == 0:
        fails += 1

    # -- semantic_dedup: ~one representative per represented source --
    d = con.execute(f"""
      SELECT count(*) FILTER (n = 1) AS single, count(*) AS sources,
             sum(n) AS kept
      FROM (SELECT vec_id % {kv} AS orig, count(*) AS n
            FROM read_parquet('{out_dir}/semantic_dedup/*.parquet')
            GROUP BY 1)""").fetchone()
    frac = d[0] / max(d[1], 1)
    print(f"semantic_dedup: {d[0]}/{d[1]} represented sources keep exactly "
          f"one vector ({d[2]} kept total); boundary multi-keeps are correct "
          f"SemDeDup semantics")
    if frac < 0.95 or d[1] == 0:
        fails += 1

    print("== structural", "PASS" if fails == 0 else f"FAIL ({fails})")
    return fails

if __name__ == "__main__":
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    sys.exit(1 if main(sys.argv[1], sys.argv[2], mult) else 0)
