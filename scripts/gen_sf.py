#!/usr/bin/env python3
"""Generate a larger scale factor locally by shard-replicating a testdata dir.

Usage: gen_sf.py <srcDir> <dstDir> <replicas>
e.g.:  gen_sf.py /root/testdata/sf0.1 target/sf1.0 10

Construction: <replicas> DECORRELATED shards of the source tables — the
scaling-measurement twin of the driver's generator (which is not available
builder-side). Each replica i shifts every key by i*1e8, applied to BOTH
sides of every FK so join relationships hold shard-internally. To keep
per-operator semantics honest at the bigger size:

- documents.text: replica > 0 renames every NON-STOPWORD token with an "r<i>"
  prefix. Stopwords stay put, so language-ID votes and the c05 quality gate
  behave exactly like the source; content tokens diverge, so shingles,
  simhash signatures, minhash bands and decontamination grams are DISJOINT
  across shards — dedup outputs scale linearly instead of exploding on
  generator-made cross-shard "duplicates". Within a shard, engineered
  duplicate texts stay byte-identical duplicates.
- embeddings.embedding: replica i cyclically rotates the component order by
  i. Norms and all within-shard dot products are preserved bit-for-bit;
  cross-shard cosines decorrelate to background level. vec_id < 20 (the
  query set of s01/s02/s03) stays replica-0-only, so kNN measures a fixed
  query set against a <replicas>x corpus.
- key shift 1e8 keeps doc_id % 20 (the c01/c05/c06 benchmark split) and
  vec_id < 20 membership stable per shard.

The result is NOT the driver's sf1.0 — it is a deterministic scale-up of
sf0.1 with the same per-shard distributions, for measuring how each plan's
runtime scales with input size (NEXT.md's BENCH_sf1 table).
"""
import sys

import duckdb

OFF = 100_000_000

STOP = ["the", "a", "of", "and", "to", "in", "is",
        "der", "die", "das", "und", "ist", "ein",
        "el", "la", "los", "y", "es", "un",
        "le", "les", "et", "est",
        "的", "是", "了", "在", "我"]

# per-table: (columns-select template with {i} = replica index)
SHIFT = {
    "region": None,   # dims: copied, not replicated
    "nation": None,
    "customer": "c_custkey + {i}::BIGINT*%d AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment" % OFF,
    "supplier": "s_suppkey + {i}::BIGINT*%d AS s_suppkey, s_name, s_nationkey, s_acctbal" % OFF,
    "part": "p_partkey + {i}::BIGINT*%d AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice" % OFF,
    # timestamps: ::TIMESTAMPTZ so parquet records isAdjustedToUTC like the
    # driver's generator — DuckDB's plain TIMESTAMP lands as TIMESTAMP_NTZ in
    # Spark, where unix_micros()/window() then fail to resolve
    "orders": ("o_orderkey + {i}::BIGINT*%d AS o_orderkey, o_custkey + {i}::BIGINT*%d AS o_custkey, "
               "o_orderstatus, o_totalprice, o_orderdate::TIMESTAMPTZ AS o_orderdate, "
               "o_orderpriority") % (OFF, OFF),
    "lineitem": ("l_orderkey + {i}::BIGINT*%d AS l_orderkey, l_partkey + {i}::BIGINT*%d AS l_partkey, "
                 "l_suppkey + {i}::BIGINT*%d AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                 "l_discount, l_tax, l_returnflag, l_linestatus, "
                 "l_shipdate::TIMESTAMPTZ AS l_shipdate") % (OFF, OFF, OFF),
    "events": ("event_id + {i}::BIGINT*%d AS event_id, ts::TIMESTAMPTZ AS ts, "
               "user_id + {i}::BIGINT*%d AS user_id, "
               "event_type, value, props") % (OFF, OFF),
    "documents": ("doc_id + {i}::BIGINT*%d AS doc_id, "
                  "CASE WHEN {i} = 0 THEN text ELSE array_to_string("
                  " list_transform(string_split_regex(text, '\\s+'),"
                  "  t -> CASE WHEN length(t) = 0 OR list_contains($stop, t) THEN t"
                  "       ELSE 'r{i}' || t END), ' ') END AS text, "
                  "lang, source, n_chars") % OFF,
    "embeddings": ("vec_id + {i}::BIGINT*%d AS vec_id, "
                   "CASE WHEN {i} = 0 THEN embedding ELSE "
                   " (embedding[({i} %% len(embedding)) + 1:] || "
                   "  embedding[1:({i} %% len(embedding))])::FLOAT[] END AS embedding, "
                   "label") % OFF,
}


def main():
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for table, tmpl in SHIFT.items():
        if tmpl is None:
            con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
                        f"TO '{dst}/{table}.parquet' (FORMAT parquet)")
        else:
            parts = []
            for i in range(reps):
                sel = tmpl.replace("{i}", str(i)).replace("$stop", repr(STOP).replace('"', "'"))
                parts.append(f"SELECT {sel} FROM read_parquet('{src}/{table}.parquet')")
            union = " UNION ALL ".join(parts)
            con.execute(f"COPY ({union}) TO '{dst}/{table}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
