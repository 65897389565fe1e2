#!/usr/bin/env python3
"""Regenerate the planted NASTY corpora behind SURVEY.md §6(g)-(h).

Each corpus is a sibling of /root/testdata/sf0.001 with ONE table
replaced by a poisoned variant; everything else symlinks. Run the
normal gate against them:

    python3 tools/nastygen.py /tmp/nasty
    SPARK_GRAFT_ONLY=q_text_quality,... \
      sbt "runMain graft.Verify /tmp/nasty/docs /tmp/verify_nasty"
    python3 tools/crosscheck.py /tmp/nasty/docs /tmp/verify_nasty ...

Corpora:
  <out>/docs  — documents.parquet: empty / whitespace-only /
                single-token / CJK / punctuation-only / long-repeat
                docs (caught the ANSI DIVIDE_BY_ZERO in the quality
                ratios).
  <out>/ev    — events.parquet: null user_id, null ts, null and
                malformed props (caught the two null-semantics
                divergences in retention + sliding window).
  <out>/star  — orders/lineitem with null dates, keys, prices,
                quantities and orphan FKs (OLAP battery passed with
                no fixes needed).
  <out>/emb   — embeddings.parquet with a zero-norm vector, a NULL
                embedding, a dim-mismatched vector, and (r15)
                null-element / inf-element / NaN-element vectors
                plus a negative vec_id (caught the
                NaN-vs-NULL cosine divergence: a NaN cosine ranks
                above every real score in a descending top-k).
"""
import sys, os, glob, datetime as dt

SRC = "/root/testdata/sf0.001"


def link_all(dst, skip):
    os.makedirs(dst, exist_ok=True)
    for f in glob.glob(f"{SRC}/*.parquet"):
        name = os.path.basename(f)
        target = os.path.join(dst, name)
        if os.path.lexists(target):
            os.remove(target)
        if name not in skip:
            os.symlink(f, target)


def gen_docs(out):
    import duckdb
    d = os.path.join(out, "docs")
    link_all(d, {"documents.parquet"})
    duckdb.connect().execute(f"""
COPY (
  SELECT * FROM (VALUES
    (0::BIGINT, '', 'en', 'src0', 0::BIGINT),
    (1::BIGINT, '   ', 'en', 'src0', 3::BIGINT),
    (2::BIGINT, 'one', 'en', 'src0', 3::BIGINT),
    (3::BIGINT, 'two tokens', 'en', 'src1', 10::BIGINT),
    (4::BIGINT, '中文 测试 文本 中文 测试', 'zh', 'src1', 14::BIGINT),
    (5::BIGINT, 'the quick brown fox jumps over the lazy dog', 'en', 'src1', 43::BIGINT),
    (6::BIGINT, 'the quick brown fox jumps over the lazy dog', 'en', 'src2', 43::BIGINT),
    (7::BIGINT, repeat('word ', 500), 'en', 'src2', 2500::BIGINT),
    (8::BIGINT, 'a!!! b??? c... d,,, e;;;', 'en', 'src2', 24::BIGINT),
    (9::BIGINT, 'Ünïcödé tëst ströng  with   runs', 'de', 'src3', 32::BIGINT),
    (10::BIGINT, 'singleverylongtokenwithoutanyspacesatallinit', 'en', 'src3', 44::BIGINT),
    (11::BIGINT, 'the the the the the the the the', 'en', 'src3', 31::BIGINT),
    -- multi-line docs sharing one boilerplate line (q_dedup_lines must
    -- flag it in 12 and 13 — whitespace-padded in 13 to exercise trim —
    -- and must NOT flag 16's within-doc-only repeat)
    (12::BIGINT, 'intro line twelve' || chr(10) ||
      'shared cookie banner text here' || chr(10) || 'outro line twelve',
      'en', 'src4', 65::BIGINT),
    (13::BIGINT, 'different intro thirteen' || chr(10) ||
      '  shared cookie banner text here  ' || chr(10) || 'different outro',
      'en', 'src4', 73::BIGINT),
    (16::BIGINT, 'repeat inside' || chr(10) || 'repeat inside' || chr(10) ||
      'own third line', 'en', 'src5', 42::BIGINT),
    -- a 10-token verbatim run copied across two otherwise-unique docs
    -- (q_dedup_substring must report one merged extent in each)
    (14::BIGINT, 'u1 u2 u3 u4 u5 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 w1 w2 w3 w4 w5',
      'en', 'src5', 60::BIGINT),
    (15::BIGINT, 'a1 a2 a3 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 b1 b2 b3',
      'en', 'src5', 48::BIGINT),
    -- blocklist battery (q_blocklist_rules / funnel stage 4): a word
    -- hit in mixed case behind punctuation, and a substring-only near
    -- miss that must NOT fire the word-grain rule
    (17::BIGINT, 'visit our CASINO, win the jackpot today', 'en', 'src6', 39::BIGINT),
    (18::BIGINT, 'the casinos and jackpots words are plurals only', 'en', 'src6', 47::BIGINT),
    -- NULL-source battery (r18 verdict item 8: the r18 null-group
    -- join bug was caught by a HAND-planted corpus — the standard
    -- nasty corpora previously had no NULL sources, so the whole
    -- (source, ...)-grouped family went untested against the legal
    -- dirty shape by default). SQL GROUP BY keeps the NULL group on
    -- both engines; a plain Spark equi-join on the grouping column
    -- silently drops it (use <=>). Includes a null-source doc with
    -- NULL text (null n_tokens inside the null group) and a
    -- null-LANG row for the (lang, source) grids.
    (19::BIGINT, 'null source doc with ordinary tokens', 'en', NULL, 36::BIGINT),
    (20::BIGINT, NULL, 'en', NULL, 0::BIGINT),
    (21::BIGINT, 'second null source doc for quantile interpolation', 'en', NULL, 49::BIGINT),
    (22::BIGINT, 'null lang row keeps its own group too', NULL, 'src7', 37::BIGINT),
    -- an ALL-null-text source (every fetch failed): quantile/band
    -- contracts must hold VACUOUSLY (r19 review — 0/0 band ratios
    -- read NaN and flipped flags the oracle asserts TRUE)
    (23::BIGINT, NULL, 'en', 'src8', 0::BIGINT),
    (24::BIGINT, NULL, 'en', 'src8', 0::BIGINT)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{d}/documents.parquet' (FORMAT PARQUET)""")


def gen_events(out):
    import pyarrow as pa, pyarrow.parquet as pq
    d = os.path.join(out, "ev")
    link_all(d, {"events.parquet"})
    ts = dt.datetime.fromisoformat
    rows = [
        (1, ts("1996-03-01T10:00:00"), 1, "view", 1.0, '{"page":"home","valid":true}'),
        (2, ts("1996-03-01T10:01:00"), 1, "click", 2.0, '{"page":"item","valid":true}'),
        (3, ts("1996-03-01T10:02:00"), 1, "purchase", 9.9, '{"page":"pay","valid":true}'),
        (4, ts("1996-03-01T11:00:00"), None, "view", 1.0, '{"page":"home"}'),
        (5, ts("1996-03-01T12:00:00"), 2, "view", 1.0, None),
        (6, ts("1996-03-01T12:01:00"), 2, "click", None, "{not json at all"),
        (7, None, 3, "view", 1.0, '{"page":"home"}'),
        (8, ts("1996-03-01T13:00:00"), 2, "view", 1.0, '{"page":"home"}'),
    ]
    cols = list(zip(*rows))
    pq.write_table(pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": pa.array(cols[1], pa.timestamp("ns")),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4], pa.float64()),
        "props": pa.array(cols[5], pa.string()),
    }), f"{d}/events.parquet")


def gen_star(out):
    import duckdb
    d = os.path.join(out, "star")
    link_all(d, {"orders.parquet", "lineitem.parquet"})
    con = duckdb.connect()
    con.execute(f"""
COPY (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
    o_orderstatus,
    CASE WHEN o_orderkey % 89 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice,
    CASE WHEN o_orderkey % 83 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate,
    o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet')
) TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
COPY (
  SELECT CASE WHEN l_orderkey % 101 = 0 THEN NULL ELSE l_orderkey END AS l_orderkey,
    l_partkey, l_suppkey, l_linenumber,
    CASE WHEN l_orderkey % 97 = 0 THEN NULL ELSE l_quantity END AS l_quantity,
    CASE WHEN l_orderkey % 89 = 0 THEN NULL ELSE l_extendedprice END AS l_extendedprice,
    l_discount, l_tax, l_returnflag, l_linestatus,
    CASE WHEN l_orderkey % 83 = 0 THEN NULL ELSE l_shipdate END AS l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet')
) TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")


def gen_emb(out):
    import pyarrow as pa, pyarrow.parquet as pq
    d = os.path.join(out, "emb")
    link_all(d, {"embeddings.parquet"})
    t = pq.read_table(f"{SRC}/embeddings.parquet").to_pydict()
    ids, embs, labels = t["vec_id"], t["embedding"], t["label"]
    for i, vid in enumerate(ids):
        if vid == 20: embs[i] = [0.0] * 64   # zero norm
        if vid == 21: embs[i] = None         # null embedding
        if vid == 22: embs[i] = embs[i][:32] # dim mismatch
        # r15 classes (review): dim-complete but element-poisoned —
        # Spark reads a NULL slot as 0.0 and folds NaN/inf to a NULL
        # cosine, while DuckDB voids NULL arithmetic and ranks NaN
        # GREATEST; the shared usable-vector filter must drop all
        # three identically in every embedding consumer
        if vid == 23:
            e = list(embs[i]); e[3] = None; embs[i] = e    # null element
        if vid == 24:
            e = list(embs[i]); e[5] = float("inf"); embs[i] = e
        if vid == 25:
            e = list(embs[i]); e[7] = float("nan"); embs[i] = e
    # a clean vector at a NEGATIVE id: DuckDB % keeps the dividend's
    # sign where Spark pmod never does, so every id-keyed draw (MINSTD
    # seed spread, probe mods) must wrap identically (r15 review)
    ids = list(ids) + [-17]
    embs = list(embs) + [[0.25] * 64]
    labels = list(labels) + [3]
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(embs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), f"{d}/embeddings.parquet")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nasty"
    gen_docs(out)
    gen_events(out)
    gen_star(out)
    gen_emb(out)
    print(f"nasty corpora written under {out}/{{docs,ev,star,emb}}")
