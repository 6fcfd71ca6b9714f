#!/usr/bin/env python3
"""DuckDB floor audit for mm_phash_neardup (VERDICT r14 task 1): attribute
the sf1->sf10 wall growth to its algorithmic terms by counting, in the
ORACLE engine, each stage's row cardinality at both SFs:

  - n_docs, and the Manku geometry (m chunks, C(m, m-4) key tables,
    worst-case key bits) simhashGeometry picks for that n
  - key rows = n_docs x tables (the explode the band join consumes)
  - candidate pairs = sum over (table, key) buckets of c*(c-1)/2 — the
    EXACT number of join-output rows the hamming verifier scans
  - verified pairs (hamming <= 4, distinct) — the result size
  - max bucket width — whether pairs come from skew or from volume

The fingerprints are computed with the oracle's own CTEs (md5-derived
60-bit majority vote over distinct payload 8-grams — bit-identical to the
Spark PhashSimhash kernel, proven by the mm_phash_neardup CORRECTNESS
gate), and the key tables replicate Dedup.simhashGeometry/simhashKeys
bit arithmetic. So the counts are an independent-engine audit of the
growth term, the part_cosim discipline.

    python3 tools/phash_floor_audit.py [sfdir ...]
"""
import duckdb, json, math, sys, time

RADIUS = 4
TARGET_WIDTH = 16


def chunk_widths(m):
    base, extra = divmod(60, m)
    return [base + 1 if i < extra else base for i in range(m)]


def geometry(n):
    """Twin of Dedup.simhashGeometry."""
    need = max(0.0, math.log2(max(1, n) / TARGET_WIDTH))
    for m in range(RADIUS + 1, 60):
        c = m - RADIUS
        if sum(sorted(chunk_widths(m))[:c]) >= need:
            break
    w = chunk_widths(m)
    from itertools import combinations
    combos = list(combinations(range(m), m - RADIUS))
    return w, combos


def key_exprs(widths, combos):
    offs = [0]
    for w in widths:
        offs.append(offs[-1] + w)

    def chunk(i):
        return f"((sim >> {offs[i]}) % {1 << widths[i]})"

    out = []
    for t, combo in enumerate(combos):
        acc, shift = "0", 0
        for i in combo:
            acc = f"{acc} + {chunk(i)} * {1 << shift}"
            shift += widths[i]
        out.append((t, f"({acc})"))
    return out


def audit(d):
    con = duckdb.connect()
    t0 = time.time()
    n = con.execute(f"SELECT count(*) FROM '{d}/documents.parquet'").fetchone()[0]
    widths, combos = geometry(n)
    key_bits = sum(sorted(widths)[: len(widths) - RADIUS])
    con.execute(f"""
        CREATE TEMP TABLE sh AS
        WITH g AS (SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(octet_length(encode(text)) - 7, 1) + 1),
            i -> substr(text, CAST(i AS INT), 8))) AS gs
          FROM '{d}/documents.parquet'),
        hb AS (SELECT doc_id,
          list_transform(gs, gk -> ('0x'||substr(md5(gk),1,15))::BIGINT) AS hts
          FROM g)
        SELECT doc_id,
          list_sum(list_transform(range(0, 60), i ->
            CASE WHEN list_sum(list_transform(hts, h -> ((h >> i) & 1)*2 - 1)) > 0
                 THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS sim
        FROM hb""")
    t_fp = time.time() - t0
    keys_union = " UNION ALL ".join(
        f"SELECT {t} AS t, {e} AS key, doc_id, sim FROM sh" for t, e in key_exprs(widths, combos))
    con.execute(f"CREATE TEMP TABLE keyed AS {keys_union}")
    buckets = con.execute("""
        SELECT count(*) AS n_buckets, max(c) AS max_width,
               CAST(sum(c*(c-1)//2) AS BIGINT) AS cand_pairs
        FROM (SELECT t, key, count(*) AS c FROM keyed GROUP BY 1, 2)""").fetchone()
    verified = con.execute(f"""
        SELECT count(*) FROM (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM keyed a JOIN keyed b ON a.t = b.t AND a.key = b.key
            AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sim, b.sim)) <= {RADIUS})""").fetchone()[0]
    return {
        "dir": d, "n_docs": n, "m_chunks": len(widths),
        "tables": len(combos), "key_bits_worst": key_bits,
        "key_rows": n * len(combos),
        "n_buckets": buckets[0], "max_bucket_width": buckets[1],
        "candidate_pairs": buckets[2], "verified_pairs": verified,
        "fingerprint_sec_duckdb": round(t_fp, 1),
        "total_sec_duckdb": round(time.time() - t0, 1),
    }


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["testdata-sf1", "testdata-sf10"]
    rows = [audit(d) for d in dirs]
    for r in rows:
        print(json.dumps(r))
    if len(rows) == 2 and rows[0]["n_docs"]:
        a, b = rows
        print(json.dumps({"ratios_per_10x": {
            k: round(b[k] / a[k], 2) for k in
            ("key_rows", "candidate_pairs", "verified_pairs")
            if a[k]}}))
