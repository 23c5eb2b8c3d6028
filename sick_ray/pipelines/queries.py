"""Operator-level queries with DuckDB oracle parity (driver contract).

Each entry is a callable ``(sf_dir) -> Dataset | pa.Table | DataFrame``
implemented Ray-Data-first, plus (where SQL-expressible) an ANSI-SQL
oracle string producing identical column names, dtypes and values on the
same parquet tables. Aggregate columns are rounded identically on both
sides where floating-point summation order could differ.

Patterns exercised (SURVEY.md §2 mapping):
- zero-copy Arrow map_batches projections/filters/derived columns
- partial aggregation (vectorized per batch) + small driver combine for
  low-cardinality keys; hash-partitioned grouped_apply for high-cardinality
- broadcast hash join for small dimension tables (ray.put once)
- per-batch partial top-k + driver merge instead of a global sort
- exact dedup keep-first; group stats; token counting; path queries (the
  analogue of the reference's ``query("a.b.[0]")`` —
  json-sick-scala ``IncrementalEBAReader.scala:134-186``)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sick_ray.config import DedupConfig
from sick_ray.functions.urlnorm import canonicalize_urls, synth_urls
from sick_ray.stages.minhash import _string_col_buffers
from sick_ray.shuffle import (
    combine_keys,
    first_mask,
    grouped_apply,
    join_partitions,
    sort_index,
)
from sick_ray.xxh import xxh64_strings


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


QCFG = DedupConfig(num_partitions=16, minhash_concurrency=4)


# --------------------------------------------------------------- documents

def _add_text_fp(batch: pa.Table) -> pa.Table:
    fp = xxh64_strings(batch.column("text")).view(np.int64)
    return batch.append_column("fp64", pa.array(fp, type=pa.int64()))


def q_exact_dedup_docs(sf_dir: str):
    """One row per distinct text; keep min doc_id. groupby(text-hash) with
    vectorized keep-first (stages/exact.py pattern on the documents table)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    with_fp = docs.map_batches(_add_text_fp, batch_format="pyarrow")

    def keep_first(part: pa.Table) -> pa.Table:
        fp = part.column("fp64").to_numpy(zero_copy_only=False)
        did = part.column("doc_id").to_numpy(zero_copy_only=False)
        order = sort_index(fp, did)
        keep = order[first_mask(fp[order])]
        return part.take(pa.array(np.sort(keep))).select(["doc_id", "n_chars"])

    return grouped_apply(with_fp, ["fp64"], keep_first, num_partitions=QCFG.num_partitions)


SQL_EXACT_DEDUP_DOCS = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


def q_dup_group_stats(sf_dir: str):
    """Per distinct text: group id (min doc_id) + member count — the
    analogue of the reference's per-value use counters (Bijection.Freq,
    SickSharp/Encoder/Bijection.cs:106-109)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    with_fp = docs.map_batches(_add_text_fp, batch_format="pyarrow")

    def stats(part: pa.Table) -> pa.Table:
        fp = part.column("fp64").to_numpy(zero_copy_only=False)
        did = part.column("doc_id").to_numpy(zero_copy_only=False)
        order = sort_index(fp, did)
        fps, dids = fp[order], did[order]
        fm = first_mask(fps)
        starts = np.flatnonzero(fm)
        cnt = np.diff(np.append(starts, len(fps)))
        return pa.table(
            {
                "group_id": pa.array(dids[fm], type=pa.int64()),
                "n_members": pa.array(cnt, type=pa.int64()),
            }
        )

    return grouped_apply(with_fp, ["fp64"], stats, num_partitions=QCFG.num_partitions)


SQL_DUP_GROUP_STATS = """
SELECT CAST(min(doc_id) AS BIGINT) AS group_id,
       CAST(count(*) AS BIGINT) AS n_members
FROM documents GROUP BY text
"""


def q_token_count_docs(sf_dir: str):
    from sick_ray.functions.text import add_token_count

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(add_token_count, batch_format="pyarrow").select_columns(
        ["doc_id", "token_count"]
    )


SQL_TOKEN_COUNT_DOCS = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[0-9A-Za-z]+')) AS BIGINT) AS token_count
FROM documents
"""


def q_token_count_bpe_docs(sf_dir: str):
    """Whitespace + BPE-ish (GPT-2-style pre-tokenizer, RE2-adapted)
    token counts per doc — see functions/text.py::add_token_count_bpe.
    Both patterns are RE2 on both sides, so counts are exact."""
    from sick_ray.functions.text import add_token_count_bpe

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        add_token_count_bpe, batch_format="pyarrow"
    ).select_columns(["doc_id", "ws_tokens", "bpe_tokens"])


SQL_TOKEN_COUNT_BPE_DOCS = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'))
         AS BIGINT) AS bpe_tokens
FROM documents
"""


def q_docs_stats_by_lang(sf_dir: str):
    """Low-cardinality grouped aggregate: vectorized per-batch partials,
    tiny driver combine (pre-aggregation pattern — no full shuffle)."""
    docs = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_DOCS_STATS_BY_LANG = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


def q_filter_long_en_docs(sf_dir: str):
    """Projection + vectorized predicate inside map_batches."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars", "source"])

    def flt(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch.column("lang"), "en"),
            pc.greater_equal(batch.column("n_chars"), 500),
        )
        return batch.filter(m).select(["doc_id", "source", "n_chars"])

    return docs.map_batches(flt, batch_format="pyarrow")


SQL_FILTER_LONG_EN_DOCS = """
SELECT doc_id, source, n_chars FROM documents
WHERE lang = 'en' AND n_chars >= 500
"""


# ----------------------------------------------------------- TPC-H-ish ops

def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: partial aggregation per batch, driver combine."""
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("sum_qty", "sum"),
        sum_base_price=("sum_base_price", "sum"),
        sum_disc_price=("sum_disc_price", "sum"),
        count_order=("count_order", "sum"),
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(2)
    out["count_order"] = out["count_order"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top10_orders(sf_dir: str):
    """Top-k without a global sort: per-batch partial top-k, driver merge."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(10),
            preserve_index=False,
        )

    parts = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(10)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_TOP10_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_segment_revenue(sf_dir: str):
    """Dimension attach via shuffle.attach_dim: the customer lookup is
    assembled IN the cluster from the dimension dataset's block refs
    (plasma broadcast + vectorized searchsorted probe) below the 2M-row
    switch, and a distributed Dataset.join above it — TPC-H scales
    customer with SF, so a driver-pickled dict and a per-row Series.map
    probe were the wrong shape (round-3 VERDICT 'What's wrong #3')."""
    from sick_ray.shuffle import attach_dim

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    withseg = attach_dim(orders, cust, on="o_custkey", key_col="c_custkey",
                         val_col="c_mktsegment",
                         num_partitions=QCFG.num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["c_mktsegment", "o_totalprice"]).to_pandas()
        g = df.groupby("c_mktsegment", as_index=False).agg(
            revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = withseg.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("c_mktsegment", as_index=False).agg(
        revenue=("revenue", "sum"), n_orders=("n_orders", "sum")
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_region_nations(sf_dir: str):
    """Same attach_dim shape as q_segment_revenue (region is 5 rows — the
    broadcast path always wins here, but the pattern is the point: the
    driver never pulls a join side)."""
    from sick_ray.shuffle import attach_dim

    region = _read(sf_dir, "region", columns=["r_regionkey", "r_name"])
    nation = _read(sf_dir, "nation", columns=["n_regionkey"])
    withr = attach_dim(nation, region, on="n_regionkey",
                       key_col="r_regionkey", val_col="r_name",
                       num_partitions=QCFG.num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["r_name"]).to_pandas()
        g = df.groupby("r_name", as_index=False).size().rename(columns={"size": "n_nations"})
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = withr.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("r_name", as_index=False).agg(n_nations=("n_nations", "sum"))
    out["n_nations"] = out["n_nations"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_REGION_NATIONS = """
SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_distinct_segments(sf_dir: str):
    cust = _read(sf_dir, "customer", columns=["c_mktsegment"])

    def distinct(part: pa.Table) -> pa.Table:
        vals = sorted(set(part.column("c_mktsegment").to_pylist()))
        return pa.table({"c_mktsegment": pa.array(vals, type=pa.string())})

    return grouped_apply(
        cust, ["c_mktsegment"], distinct, num_partitions=4, partial=distinct
    )


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer"


# ---------------------------------------------------------------- events

def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (streaming-shaped op on the ordered log):
    window = floor(ts, 1h); partial per batch + driver combine."""
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("value", "size"), total_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["event_type", "hour"], as_index=False).agg(
        n_events=("n_events", "sum"), total_value=("total_value", "sum")
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["total_value"] = out["total_value"].round(2)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_HOURLY = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_user_sessions(sf_dir: str):
    """Sessionization (streaming-shaped op over the ordered log): a new
    session starts after a >30 min gap per user. Hash-partitioned by
    user_id; per-partition fully vectorized (sort + diff), the ray_guide
    'groupby(key) + windowing over the sorted group' pattern."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    GAP_US = 30 * 60 * 1_000_000

    def sessions(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "n_sessions": pa.array([], type=pa.int64())}
            )
        uid = part.column("user_id").to_numpy(zero_copy_only=False)
        ts = part.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        order = sort_index(uid, ts)
        u_s, t_s = uid[order], ts[order]
        fm = first_mask(u_s)
        new_sess = fm.copy()
        new_sess[1:] |= (t_s[1:] - t_s[:-1]) > GAP_US
        starts = np.flatnonzero(fm)
        n_sessions = np.add.reduceat(new_sess.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": pa.array(u_s[fm], type=pa.int64()),
                "n_sessions": pa.array(n_sessions, type=pa.int64()),
            }
        )

    return grouped_apply(ev, ["user_id"], sessions, num_partitions=QCFG.num_partitions)


SQL_USER_SESSIONS = """
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
) GROUP BY user_id
"""


def q_props_path(sf_dir: str):
    """Path query over a JSON column — the engine analogue of the
    reference's dotted-path cursor query (``SickReader.Query.cs:11-42``,
    Scala ``IncrementalEBAReader.scala:134-186``): extract ``$.k``."""
    ev = _read(sf_dir, "events", columns=["event_id", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), r'"k":\s*(?P<v>-?\d+)')
        k_val = pc.struct_field(m, "v")
        return pa.table({"event_id": batch.column("event_id"), "k_val": k_val})

    return ev.map_batches(extract, batch_format="pyarrow")


SQL_PROPS_PATH = """
SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events
"""


def q_props_path_deep(sf_dir: str):
    """General path-query engine (functions/pathq.py — the analogue of the
    reference's ``query(ref, "a.b.[0]")``, ``SickPath.cs:7-63``) over a
    nested JSON document built deterministically from event columns:
    dotted chains, positive and NEGATIVE array indexes, missing paths."""
    from sick_ray.functions.pathq import make_path_extractor

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "props"])

    def build_doc(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch.column("event_id"), pa.string())
        uid = pc.cast(batch.column("user_id"), pa.string())
        j = pc.binary_join_element_wise(
            '{"meta":{"ids":[', eid, ",", uid, '],"type":"',
            batch.column("event_type"), '"},"p":', batch.column("props"), "}",
            "",
        )
        return pa.table({"event_id": batch.column("event_id"), "j": j})

    extractor = make_path_extractor(
        {
            "last_id": "meta.ids.[-1]",      # negative index (readArrayElementRef [-1])
            "first_id": "meta.ids[0]",       # attached bracket
            "etype": "meta.type",            # dotted chain
            "k_val": "p.k",                  # nested object hop
            "miss": "meta.nope.x",           # missing path → NULL
        },
        col="j",
        keep=["event_id"],
    )
    return ev.map_batches(build_doc, batch_format="pyarrow").map_batches(
        extractor, batch_format="pyarrow"
    )


SQL_PROPS_PATH_DEEP = """
SELECT event_id,
       json_extract_string(j, '$.meta.ids[#-1]') AS last_id,
       json_extract_string(j, '$.meta.ids[0]') AS first_id,
       json_extract_string(j, '$.meta.type') AS etype,
       json_extract_string(j, '$.p.k') AS k_val,
       json_extract_string(j, '$.meta.nope.x') AS miss
FROM (
  SELECT event_id,
         '{"meta":{"ids":[' || CAST(event_id AS VARCHAR) || ',' ||
         CAST(user_id AS VARCHAR) || '],"type":"' || event_type ||
         '"},"p":' || props || '}' AS j
  FROM events
)
"""


# ------------------------------------------------------------- embeddings

def q_knn_embeddings(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id=0 embedding."""
    import pyarrow.parquet as pq

    from sick_ray.stages.ann import knn_bruteforce

    emb0 = (
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .filter(pc.equal(pc.field("vec_id"), 0))
        .column("embedding")
        .to_pylist()[0]
    )
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_bruteforce(ds, np.asarray([emb0]), k=10)
    out = out.select(["vec_id", "rank"])
    return out


SQL_KNN_EMBEDDINGS = """
SELECT e.vec_id,
       CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
       ) - 1 AS BIGINT) AS rank
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY rank LIMIT 10
"""


# --------------------------------------------- dedup pipeline (rows-only)

def _docs_as_webtext(sf_dir: str):
    """Adapter: documents table → the webtext shape (deterministic)."""
    docs = _read(sf_dir, "documents")

    def adapt(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        urls = [f"doc://{d}" for d in did]
        ts = (1735689600_000_000 + did * 1_000_000).astype("datetime64[us]")
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "html": pa.array([None] * len(urls), type=pa.binary()),
                "text": batch.column("text"),
                "lang": batch.column("lang"),
            }
        )

    return docs.map_batches(adapt, batch_format="pyarrow")


def q_dedup_clusters_docs(sf_dir: str):
    """Flagship 3-stage near-dup pipeline on the documents corpus."""
    from sick_ray.pipelines.dedup import run_dedup

    res = run_dedup(_docs_as_webtext(sf_dir), QCFG)
    return res.clusters


def q_dedup_cluster_membership(sf_dir: str):
    """SQL-checkable view of the flagship pipeline's CLUSTER MEMBERSHIP:
    (cluster_id = min doc_id of the component, doc_id) per document.

    Content-fingerprint cluster ids aren't SQL-derivable, but the
    membership partition is deterministic, so relabeling every cluster by
    its minimum member doc id yields a comparable table. The DuckDB oracle
    rebuilds the same components from first principles: exact k-shingle
    Jaccard ≥ the engine's verify threshold (integer inequality) + exact-
    text duplicate edges, closed transitively with a recursive CTE — the
    reference's everything-deterministic-gets-a-second-implementation
    discipline (SickTests.cs:202-204).

    VALIDITY DOMAIN: the engine links a pair when its 128-perm SIGNATURE
    match fraction ≥ 0.72 (an estimator of J, σ ≈ 0.04 near the
    threshold, deterministic for a fixed corpus+seed) and the pair shares
    an LSH band; the oracle links on EXACT J ≥ 0.72. The two predicates
    provably agree only for pairs whose exact J is well clear of 0.72
    (|J − 0.72| ≳ 4σ ≈ 0.16). The shipped corpora satisfy this with one
    measured exception that happens to agree: sf0.01 has no pair with
    J ∈ (0.3, 0.85) except planted near-dups ≥ 0.875; sf0.1 has exactly
    one pair at J = 0.75, and the seed's fixed signature draw matches
    (parity asserted at BOTH scales in
    test_oracle_parity.test_cluster_membership_sf01). A corpus dense
    around J ≈ 0.72 would need a tolerance-banded oracle instead."""
    from sick_ray.pipelines.dedup import run_dedup

    res = run_dedup(_docs_as_webtext(sf_dir), QCFG)
    cl = res.clusters.select_columns(["url", "cluster_id"])

    def to_did(batch: pa.Table) -> pa.Table:
        did = pc.cast(pc.utf8_slice_codeunits(batch.column("url"), 6, 2**30), pa.int64())
        return pa.table({"did": did, "cid": batch.column("cluster_id")})

    rows = cl.map_batches(to_did, batch_format="pyarrow")

    def relabel(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {"cluster_id": pa.array([], type=pa.int64()),
                 "doc_id": pa.array([], type=pa.int64())}
            )
        cid = part.column("cid").to_numpy(zero_copy_only=False)
        did = part.column("did").to_numpy(zero_copy_only=False)
        order = sort_index(cid, did)
        c_s, d_s = cid[order], did[order]
        fm = first_mask(c_s)
        starts = np.flatnonzero(fm)
        counts = np.diff(np.append(starts, len(c_s)))
        label = np.repeat(d_s[starts], counts)   # min did per cluster
        return pa.table(
            {
                "cluster_id": pa.array(label, type=pa.int64()),
                "doc_id": pa.array(d_s, type=pa.int64()),
            }
        )

    return grouped_apply(rows, ["cid"], relabel, num_partitions=QCFG.num_partitions)


# components from first principles: exact-Jaccard edges at the engine's
# verify threshold (0.72 = 18/25 ⇒ J≥0.72 ⇔ 43·inter ≥ 18·(szu+szv), exact
# in integers) ∪ exact-text dup edges, transitive closure, min-member label
SQL_DEDUP_CLUSTER_MEMBERSHIP = """
WITH RECURSIVE ex AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(CASE
      WHEN len(t) >= 5 THEN
        [array_to_string(t[i:i+4], ' ') for i in generate_series(1, len(t)-4)]
      WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
      ELSE CAST([] AS VARCHAR[]) END) AS s
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z]+') AS t
          FROM documents)
  )
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), jedges AS (
  SELECT p.u, p.v FROM pairs p
  JOIN sizes su ON su.doc_id = p.u
  JOIN sizes sv ON sv.doc_id = p.v
  WHERE 43 * p.inter >= 18 * (su.sz + sv.sz)
), dedges AS (
  SELECT a.doc_id AS u, b.doc_id AS v FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND coalesce(a.text, '') = coalesce(b.text, '')
), sym AS (
  SELECT u AS a, v AS b FROM jedges UNION SELECT v, u FROM jedges
  UNION SELECT u, v FROM dedges UNION SELECT v, u FROM dedges
), reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
), lab AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
)
SELECT cluster_id, doc_id FROM lab
"""


def q_doc_spans(sf_dir: str):
    """Substring dedup spans on the documents corpus."""
    from sick_ray.stages.suffix import duplicate_spans

    return duplicate_spans(_docs_as_webtext(sf_dir), QCFG)


SPANS_GOLDEN = {
    "sf0.01": "/root/repo/tests/golden/spans_anchored_sf001.parquet",
    "sf0.1": "/root/repo/tests/golden/spans_anchored_sf01.parquet",
}


def q_doc_spans_anchored(sf_dir: str):
    """Substring-dedup spans, DETERMINISTIC variant: the content-anchored
    global pass only (duplicate_spans(include_local=False)) — exactly the
    spans whose 128-byte windows at content-defined anchors repeat across
    (or ≥128 apart within) docs. Unlike doc_spans (whose best-effort
    local pass drifts ~0.1% with Ray task bundling), this output is
    bit-reproducible, so it is oracled GOLDEN-style against an
    INDEPENDENT scalar implementation (scripts/make_spans_golden.py:
    textbook per-doc Horner rolling hash with python ints vs the
    engine's vectorized modular prefix sums over one concatenated
    buffer). Spans are corpus-dependent, so one golden per scale; the
    oracle reads the sf0.01 file (the driver's correctness scale) and
    the sf0.1 twin is asserted in tests/test_suffix.py."""
    from sick_ray.stages.suffix import duplicate_spans

    return duplicate_spans(_docs_as_webtext(sf_dir), QCFG,
                           include_local=False)


def spans_golden_sql(sf_dir: str) -> str:
    """Golden-oracle SQL for doc_spans_anchored at ``sf_dir``'s scale.
    Spans are corpus-dependent — one golden per scale factor, regenerated
    by scripts/make_spans_golden.py — so comparing another scale's output
    against the wrong golden would report a spurious mismatch. Raises for
    scales without a golden instead (ADVICE r3). The driver's static
    ``oracle_sql()`` entry pins the sf0.01 golden (its correctness
    scale); in-repo checks at other scales go through this selector."""
    import os as _os

    key = _os.path.basename(_os.path.normpath(sf_dir))
    if key not in SPANS_GOLDEN:
        raise ValueError(
            f"no doc_spans_anchored golden for scale {key!r} (have "
            f"{sorted(SPANS_GOLDEN)}); regenerate with "
            "scripts/make_spans_golden.py"
        )
    return f'SELECT url, start, "end" FROM read_parquet(\'{SPANS_GOLDEN[key]}\')'


SQL_DOC_SPANS_ANCHORED = spans_golden_sql("/root/testdata/sf0.01")


def q_simhash_docs(sf_dir: str):
    """SimHash signatures per doc — oracled against a GOLDEN table computed
    by an independent scalar second implementation (scripts/make_golden.py;
    the reference's cross-implementation conformance discipline,
    SickTests.cs:202-204). The golden rows are keyed by (doc_id,
    md5(text)), so the same file serves every scale factor."""
    from sick_ray.functions.simhash import add_simhash

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(add_simhash, batch_format="pyarrow").select_columns(
        ["doc_id", "simhash"]
    )


GOLDEN = "/root/repo/tests/golden/text_golden.parquet"

SQL_SIMHASH_DOCS = f"""
SELECT d.doc_id, g.simhash
FROM documents d JOIN read_parquet('{GOLDEN}') g
  ON g.doc_id = d.doc_id AND g.text_md5 = md5(coalesce(d.text, ''))
"""


def q_lang_id_docs(sf_dir: str):
    from sick_ray.functions.text import LangId

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return docs.map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 2)
    ).select_columns(["doc_id", "lang", "lang_pred"])


def _lang_id_sql() -> str:
    """DuckDB oracle for LangId's batch path, generated from the SAME
    _STOPWORDS tables and regexes the engine uses (both run RE2, so the
    per-language alternation counts are identical): per-language
    case-insensitive stopword-hit counts, argmax with first-in-sorted-
    order tie-break (np.argmax semantics), und on zero/<2% hits, CJK
    override. Regenerating from the shared constant keeps the oracle in
    lockstep with the engine — the conformance discipline of the
    reference's cross-implementation tests."""
    from sick_ray.functions.text import _STOPWORDS

    langs = sorted(_STOPWORDS)
    hits = ",\n    ".join(
        "length(regexp_extract_all(coalesce(text, ''), "
        f"'(?i)\\b(?:{'|'.join(sorted(_STOPWORDS[lang]))})\\b')) AS h_{lang}"
        for lang in langs
    )
    g = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    argmax = "\n       ".join(
        "WHEN "
        + " AND ".join(f"h_{lang} >= h_{o}" for o in langs[i + 1:])
        + f" THEN '{lang}'"
        if i < len(langs) - 1
        else f"ELSE '{lang}'"
        for i, lang in enumerate(langs)
    )
    return f"""
WITH s AS (
  SELECT doc_id, lang,
    length(regexp_extract_all(coalesce(text, ''), '\\pL+')) AS ntok,
    {hits},
    regexp_matches(coalesce(text, ''), '[一-鿿぀-ヿ]') AS cjk
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN cjk THEN 'zh'
       WHEN ntok = 0 OR {g} = 0 OR {g} * 50 < ntok THEN 'und'
       {argmax}
  END AS lang_pred
FROM s
"""


SQL_LANG_ID_DOCS = _lang_id_sql()


def q_quality_docs(sf_dir: str):
    from sick_ray.functions.text import add_quality_score

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(add_quality_score, batch_format="pyarrow").select_columns(
        ["doc_id", "quality"]
    )


def _grouped_quantile_cont(flag_col, price: np.ndarray, qs, names) -> pa.Table:
    """Shared grouped quantile_cont kernel (value at rank q*(n-1),
    linearly interpolated — DuckDB semantics) used by BOTH the exact
    query and its bottom-k sketch twin, so the interpolation convention
    can never drift between them. Groups by integer codes (no
    object-dtype sorts on the hot path)."""
    if len(price) == 0:
        return pa.table(
            {"l_returnflag": pa.array([], type=pa.string())}
            | {nm: pa.array([], type=pa.float64()) for nm in names}
        )
    uniq = pc.unique(flag_col)
    codes = pc.index_in(flag_col, uniq).to_numpy(zero_copy_only=False)
    order = np.lexsort((price, codes))
    c_s, v_s = codes[order], price[order]
    fm = first_mask(c_s)
    starts = np.flatnonzero(fm)
    counts = np.diff(np.append(starts, len(c_s)))
    cols = {"l_returnflag": uniq.take(pa.array(c_s[starts])).cast(pa.string())}
    for q, nm in zip(qs, names):
        pos = starts + q * (counts - 1)
        lo = pos.astype(np.int64)
        frac = pos - lo
        hi = np.minimum(lo + 1, starts + counts - 1)
        val = v_s[lo] + (v_s[hi] - v_s[lo]) * frac
        cols[nm] = pa.array(np.round(val, 4), type=pa.float64())
    return pa.table(cols)


def q_price_quantiles(sf_dir: str):
    """Distributed exact grouped quantiles (p25/p50/p75/p95 of
    l_extendedprice by returnflag): hash-partition by group key, one
    vectorized sort + segmented rank interpolation per partition
    (_grouped_quantile_cont — shared with the bottom-k sketch twin).
    Exact path is right while a group's values fit one partition; the
    scale path is q_price_quantiles_sketch."""
    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    QS = (0.25, 0.50, 0.75, 0.95)
    names = ("p25", "p50", "p75", "p95")

    def quantiles(part: pa.Table) -> pa.Table:
        return _grouped_quantile_cont(
            part.column("l_returnflag").combine_chunks(),
            part.column("l_extendedprice").to_numpy(zero_copy_only=False)
            .astype(np.float64),
            QS, names,
        )

    return grouped_apply(li, ["l_returnflag"], quantiles,
                         num_partitions=QCFG.num_partitions)


def q_price_quantiles_sketch(sf_dir: str, k: int = 4096):
    """APPROXIMATE grouped quantiles via a mergeable bottom-k uniform
    sample — the 100-TB scale path of q_price_quantiles: every row gets
    a deterministic priority u = mix64(row identity); each batch keeps
    only its k smallest-u rows per group, partials merge by again
    keeping the k smallest — a uniform without-replacement sample
    (bottom-k sketch) whose p-quantile has rank error ~ sqrt(p(1-p)/k)
    (≈0.8% at k=4096). Only k rows per group per batch ever shuffle, and
    the quantile interpolation is the SAME _grouped_quantile_cont kernel
    as the exact twin. The output is a DETERMINISTIC function of the
    input (priorities are content-derived, bottom-k merge commutes), so
    it is oracled GOLDEN-style against an independent scalar second
    implementation (scripts/make_sketch_golden.py: pure-python
    splitmix64 + per-group scalar interpolation); pytest additionally
    gates the estimated quantiles' true CDF positions."""
    from sick_ray.shuffle import mix64

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_extendedprice"])
    QS = (0.25, 0.50, 0.75, 0.95)
    names = ("p25", "p50", "p75", "p95")

    def bottom_k(flag_col, u, price):
        """(flag_col, u, price) numpy/arrow triple → the k smallest-u
        rows per group, vectorized via integer group codes."""
        codes = pc.index_in(flag_col, pc.unique(flag_col)).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((u, codes))
        c_s = codes[order]
        fm = first_mask(c_s)
        starts = np.flatnonzero(fm)
        pos = np.arange(len(c_s)) - np.repeat(
            starts, np.diff(np.append(starts, len(c_s)))
        )
        keep = order[pos < k]
        return flag_col.take(pa.array(keep)), u[keep], price[keep]

    def sample_rows(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False)
        u = mix64(ok.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87)
                  + ln.astype(np.uint64)).view(np.int64)
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        f, u2, p2 = bottom_k(
            batch.column("l_returnflag").combine_chunks(), u, price
        )                                   # map-side pre-truncation
        return pa.table({
            "l_returnflag": f,
            "u": pa.array(u2, type=pa.int64()),
            "price": pa.array(p2, type=pa.float64()),
        })

    def estimate(part: pa.Table) -> pa.Table:
        # merge: keep the global k smallest per group, then the SHARED
        # quantile kernel over the sample
        f, _u, p2 = bottom_k(
            part.column("l_returnflag").combine_chunks(),
            part.column("u").to_numpy(zero_copy_only=False),
            part.column("price").to_numpy(zero_copy_only=False),
        )
        return _grouped_quantile_cont(f, p2, QS, names)

    return grouped_apply(
        li.map_batches(sample_rows, batch_format="pyarrow"),
        ["l_returnflag"], estimate, num_partitions=QCFG.num_partitions,
    )


SQL_PRICE_QUANTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
FROM lineitem GROUP BY l_returnflag
"""


SQL_QUALITY_DOCS = """
WITH feats AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digits,
         CAST(len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9A-Za-z]+')) AS DOUBLE) AS n_tokens
  FROM documents
), scored AS (
  SELECT doc_id,
         least(greatest(ln(1 + n_chars) / ln(2000.0), 0), 1) AS len_score,
         least(greatest(1 - abs(
           CASE WHEN n_tokens > 0
                THEN (n_chars - n_tokens + 1) / greatest(n_tokens, 1)
                ELSE 0 END - 5.0) / 10.0, 0), 1) AS tok_score,
         least(greatest(
           1 - 2.0 * (n_digits / greatest(n_chars, 1.0)
                      + n_punct / greatest(n_chars, 1.0)), 0), 1) AS noise_pen
  FROM feats
)
SELECT doc_id,
       round(0.4 * len_score + 0.3 * tok_score + 0.3 * noise_pen, 6) AS quality
FROM scored
"""


def q_knn_lsh_embeddings(sf_dir: str):
    """LSH-bucketed ANN (scale path of q_knn_embeddings).

    ``n_planes`` scales with corpus size (~log2(n)/2, keeping expected
    bucket occupancy useful instead of empty) and every query probes its
    1-bit-flip pattern neighborhood (multiprobe) — round 2's fixed
    16-plane config found ~no collisions at n=500 and returned 1 row
    where k=10. The result is gated loudly: fewer than k rows raises."""
    import pyarrow.parquet as pq

    from sick_ray.config import AnnConfig
    from sick_ray.stages.ann import knn_lsh

    emb0 = (
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .filter(pc.equal(pc.field("vec_id"), 0))
        .column("embedding")
        .to_pylist()[0]
    )
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = ds.count()
    n_planes = int(max(4, min(16, int(np.log2(max(n, 16))) // 2 + 2)))
    out = knn_lsh(
        ds, np.asarray([emb0]), k=10,
        cfg=AnnConfig(n_planes=n_planes, n_tables=8), multiprobe=1,
    )
    if out.num_rows < 10:
        raise RuntimeError(
            f"knn_lsh returned {out.num_rows} rows < k=10 — candidate set "
            f"collapsed (n={n}, n_planes={n_planes}); widen multiprobe or "
            "lower n_planes"
        )
    return out.select(["vec_id", "rank"])


def q_knn_ivf_embeddings(sf_dir: str):
    """IVF-partitioned ANN (coarse quantizer + inverted-list probe — the
    corpus-pruning scale path). The conformance surface runs EXHAUSTIVE
    probe (nprobe == n_centroids): every inverted list is scanned, so the
    result must equal brute force exactly — the reference's
    indexed-access == enumerated-access discipline
    (``EBAReaderWriterTest.scala:247-288``) applied to the IVF plumbing
    (train → assign → list-masked scan → merge). The pruned regime
    (nprobe < n_centroids) is recall-gated in pytest on a clustered
    corpus (test_knn_ivf_recall) where approximation is meaningful."""
    import pyarrow.parquet as pq

    from sick_ray.stages.ann import knn_ivf

    emb0 = (
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .filter(pc.equal(pc.field("vec_id"), 0))
        .column("embedding")
        .to_pylist()[0]
    )
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_ivf(ds, np.asarray([emb0]), k=10, n_centroids=16, nprobe=16)
    if out.num_rows < 10:
        raise RuntimeError(
            f"knn_ivf returned {out.num_rows} rows < k=10 — probed lists "
            "collapsed; raise nprobe"
        )
    return out.select(["vec_id", "rank"])


def q_events_sliding_window(sf_dir: str):
    """Sliding-window aggregate (1 h windows, 30 min slide): each event
    lands in two windows — emitted as two rows per event inside
    map_batches, then the tumbling partial-combine pattern."""
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    HOUR = np.timedelta64(3600, "s")
    HALF = np.timedelta64(1800, "s")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        w0 = ts.astype("datetime64[30m]").astype("datetime64[us]")  # floor 30min
        rows = []
        for shift in (np.timedelta64(0, "s"), HALF):
            w = w0 - shift
            # window start must align to 30-min grid and contain ts
            keep = (ts >= w) & (ts < w + HOUR)
            d = pd.DataFrame(
                {
                    "event_type": df["event_type"].to_numpy()[keep],
                    "window_start": w[keep],
                    "value": df["value"].to_numpy()[keep],
                }
            )
            rows.append(d)
        g = pd.concat(rows).groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), total_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["event_type", "window_start"], as_index=False).agg(
        n_events=("n_events", "sum"), total_value=("total_value", "sum")
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["total_value"] = out["total_value"].round(2)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_SLIDING_WINDOW = """
SELECT event_type, window_start, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM (
  SELECT event_type, value, time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, ts
  FROM events
  UNION ALL
  SELECT event_type, value,
         time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, ts
  FROM events
)
WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
GROUP BY event_type, window_start
"""


def q_media_decode_real(sf_dir: str):
    """REAL multimodal decode (stages/multimodal.py): BMP pixels and PCM
    WAV samples parsed from payload bytes by dependency-free codecs, with
    per-row error isolation for corrupt payloads. Oracled against a GOLDEN
    table decoded by an INDEPENDENT scalar implementation
    (scripts/make_media_golden.py: struct-parsed BMP/RIFF, pure-Python
    integer block sums) — possible because every kernel is integer-exact
    by design (_thumbnail milli-weight floor division, int64
    sum-of-squares stats). Failures surface as a ``failed`` bool: the
    MESSAGE is implementation detail, the per-row isolation is the
    contract."""
    import ray.data as rd

    from sick_ray.stages.multimodal import decode_media, synth_media_real

    media = rd.from_arrow(synth_media_real(200, seed=7))
    imgs, wavs = decode_media(media, concurrency=2)
    i = imgs.select_columns(["media_id", "pix_mean", "decode_err"]).to_pandas()
    w = wavs.select_columns(["media_id", "rms", "decode_err"]).to_pandas()
    i = i.rename(columns={"pix_mean": "stat"})
    w = w.rename(columns={"rms": "stat"})
    out = pd.concat([i.assign(kind="image"), w.assign(kind="audio")],
                    ignore_index=True).sort_values("media_id")
    out["failed"] = out["decode_err"].notna()
    out = out.drop(columns=["decode_err"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


MEDIA_GOLDEN = "/root/repo/tests/golden/media_golden.parquet"

SQL_MEDIA_DECODE_REAL = f"""
SELECT media_id, stat, kind, failed FROM read_parquet('{MEDIA_GOLDEN}')
"""


def q_lineitem_stats(sf_dir: str):
    """Global min/max/count + rounded sum — cursor-style numeric widening
    parity (reference ``eba/cursor/SickCursor.scala:28-125``)."""
    li = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        p = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "min_qty": pa.array([float(q.min())]),
                "max_qty": pa.array([float(q.max())]),
                "sum_price": pa.array([float(p.sum())]),
                "n_rows": pa.array([len(q)], type=pa.int64()),
            }
        )

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = pd.DataFrame(
        {
            "min_qty": [parts["min_qty"].min()],
            "max_qty": [parts["max_qty"].max()],
            "sum_price": [round(parts["sum_price"].sum(), 2)],
            "n_rows": [int(parts["n_rows"].sum())],
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_LINEITEM_STATS = """
SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       round(sum(l_extendedprice), 2) AS sum_price,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
"""


def q_orders_by_priority(sf_dir: str):
    orders = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n"}), preserve_index=False)

    parts = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).agg(n=("n", "sum"))
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ORDERS_BY_PRIORITY = """
SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority, o_orderstatus
"""


def q_embedding_first_last(sf_dir: str):
    """Indexed array-element access incl. negative index — the analogue of
    the reference's ``readArrayElementRef`` with ``[-1]`` support
    (``IncrementalEBAReader.scala:199-209``)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def extract(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offs = np.asarray(col.offsets)
        first = flat[offs[:-1]]
        last = flat[offs[1:] - 1]
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "first_el": pa.array(np.round(first.astype(np.float64), 4)),
                "last_el": pa.array(np.round(last.astype(np.float64), 4)),
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow")


SQL_EMBEDDING_FIRST_LAST = """
SELECT vec_id, round(CAST(embedding[1] AS DOUBLE), 4) AS first_el,
       round(CAST(embedding[-1] AS DOUBLE), 4) AS last_el
FROM embeddings
"""


def q_ngram_exact_pairs(sf_dir: str):
    """Near-dup candidate edges verified by EXACT n-gram Jaccard ≥ 0.5
    (the precision-mode alternative to signature verification): extract →
    minhash → LSH candidates → join texts ONTO the (small) edge set →
    exact shingle-set verify. Texts reach the verifier by distributed hash
    join, never a driver broadcast of the corpus."""
    from sick_ray.extract import extract_batch
    from sick_ray.functions.ngram import make_joined_verifier
    from sick_ray.stages.exact import add_fingerprints, exact_dedup
    from sick_ray.stages.lsh import candidate_edges, distinct_edges
    from sick_ray.stages.minhash import MinHasher

    web = _docs_as_webtext(sf_dir)
    meta_full = web.map_batches(extract_batch, batch_format="pyarrow").map_batches(
        add_fingerprints, batch_format="pyarrow"
    )
    meta_full = meta_full.materialize()
    texts_ds = meta_full.select_columns(["fp64", "text"])
    meta = meta_full.map_batches(
        MinHasher, fn_constructor_args=(QCFG,), batch_format="pyarrow",
        batch_size=QCFG.batch_size, concurrency=(1, 2),
    ).materialize()
    canonical = exact_dedup(meta, QCFG).materialize()
    edges = distinct_edges(
        candidate_edges(canonical.select_columns(["fp64", "band_hash"]), QCFG), QCFG
    )
    tu = texts_ds.rename_columns({"fp64": "ju", "text": "text_u"})
    tv = texts_ds.rename_columns({"fp64": "jv", "text": "text_v"})
    joined = edges.join(
        tu, join_type="inner", num_partitions=join_partitions(QCFG.num_partitions),
        on=("u",), right_on=("ju",),
    ).join(
        tv, join_type="inner", num_partitions=join_partitions(QCFG.num_partitions),
        on=("v",), right_on=("jv",),
    )
    verified = joined.map_batches(make_joined_verifier(QCFG, 0.5), batch_format="pyarrow")

    # re-key the (tiny) verified edge set from content fingerprints to doc
    # ids (url = "doc://<did>") so the result is SQL-comparable — the LSH
    # candidate pass has full recall on the planted near-dups at sf scale,
    # making this row-identical to the exact inverted-index twin's pair set
    def fp_did(batch: pa.Table) -> pa.Table:
        did = pc.cast(pc.utf8_slice_codeunits(batch.column("url"), 6, 2**30), pa.int64())
        return pa.table({"jfp": batch.column("fp64"), "did": did})

    fmap = meta_full.select_columns(["url", "fp64"]).map_batches(
        fp_did, batch_format="pyarrow"
    ).materialize()
    e1 = verified.join(
        fmap.rename_columns({"did": "du"}), join_type="inner",
        num_partitions=join_partitions(QCFG.num_partitions),
        on=("u",), right_on=("jfp",),
    )
    e2 = e1.join(
        fmap.rename_columns({"did": "dv", "jfp": "jfp2"}), join_type="inner",
        num_partitions=join_partitions(QCFG.num_partitions),
        on=("v",), right_on=("jfp2",),
    )

    def rekey(batch: pa.Table) -> pa.Table:
        du = batch.column("du").to_numpy(zero_copy_only=False)
        dv = batch.column("dv").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.minimum(du, dv), type=pa.int64()),
                "v": pa.array(np.maximum(du, dv), type=pa.int64()),
            }
        )

    cross = e2.map_batches(rekey, batch_format="pyarrow")

    # within-exact-dup-group pairs: docs with IDENTICAL text have J=1 and
    # the inverted-index twin emits every such pair, but the LSH path runs
    # over canonical fp64 nodes (exact dups collapse before banding) — the
    # fp64-join above fans each edge out to all group members, yet pairs
    # INSIDE one group have no canonical edge to expand. Emit them from
    # the exact-dup groups directly; token-less texts produce no shingle
    # on either side (the SQL's ex CTE excludes them) so they are skipped.
    from sick_ray.shuffle import segment_pairs

    def group_rows(batch: pa.Table) -> pa.Table:
        did = pc.cast(
            pc.utf8_slice_codeunits(batch.column("url"), 6, 2**30), pa.int64()
        )
        has = pc.greater(
            pc.count_substring_regex(
                pc.utf8_lower(pc.fill_null(batch.column("text"), "")),
                "[0-9a-z]+",
            ),
            0,
        )
        return pa.table(
            {"fp64": batch.column("fp64"), "did": did, "has_tok": has}
        )

    gp = meta_full.select_columns(["url", "fp64", "text"]).map_batches(
        group_rows, batch_format="pyarrow"
    )

    def emit_group_pairs(part: pa.Table) -> pa.Table:
        fp = part.column("fp64").to_numpy(zero_copy_only=False)
        did = part.column("did").to_numpy(zero_copy_only=False)
        has = part.column("has_tok").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, fp))
        fp_s, did_s, has_s = fp[order], did[order], has[order]
        # exact-dup multiplicities are tiny (corpus dup groups); the huge
        # cap means every pair is emitted, never a star fallback
        i, j, _, _ = segment_pairs(fp_s, cap=1 << 62)
        keep = has_s[i]                  # text identical within a group
        return pa.table(
            {
                "u": pa.array(did_s[i][keep], type=pa.int64()),
                "v": pa.array(did_s[j][keep], type=pa.int64()),
            }
        )

    within = grouped_apply(
        gp, ["fp64"], emit_group_pairs,
        num_partitions=QCFG.num_partitions,
    )
    # final distinct: the tu/tv text joins key on fp64 but texts_ds has one
    # row per DOC, so an edge touching an exact-dup group of size g reaches
    # the verifier g times and each copy re-fans through the rekey joins —
    # a*b copies of every cross pair whenever either endpoint has exact
    # dups. One distinct over the (tiny) final did-pair set subsumes every
    # duplicate source. (A mid-pipeline distinct_edges(verified) would be
    # cheaper but Ray's join operator rejects map_groups output whose empty
    # blocks carry no schema.)
    return distinct_edges(cross.union(within), QCFG)


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup edges (distinct u<v pairs) over the
    embeddings table — LSH-bucketed candidates + exact cosine verify.

    FULLY oracled (round 4): the hyperplanes are deterministic config
    (seeded rng; dumped once by scripts/make_lsh_planes.py), so DuckDB
    recomputes the ENTIRE semantics — per-(vec, table) sign patterns via
    an unnest × planes join, candidate pairs = any shared (table,
    pattern) bucket, then exact float64 cosine ≥ threshold — at any sf.
    Sign bits agree because sign(dot(normalized v, p)) == sign(dot(raw
    v, p)) and both sides sum in double (disagreement needs |dot| ≲
    1e-15); the cosine agrees because the verify stage normalizes RAW
    float32 rows in float64 (see finalize_emb_lookup). Validity domain:
    the per-bucket pair cap (65536) must not truncate — counters are
    zero at every testdata scale; a truncating config diverges from the
    oracle by construction and says so in the manifest."""
    from sick_ray.config import AnnConfig
    from sick_ray.stages.ann import embedding_near_dup_edges

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup_edges(
        ds, threshold=0.3, cfg=AnnConfig(n_planes=4, n_tables=16), num_partitions=8
    )


LSH_PLANES_GOLDEN = "/root/repo/tests/golden/lsh_planes_t16_p4_d64.parquet"

SQL_EMBEDDING_NEAR_DUP = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
ue AS (
  SELECT vec_id, unnest(emb) AS val, generate_subscripts(emb, 1) AS i FROM e
),
p AS (SELECT * FROM read_parquet('{LSH_PLANES_GOLDEN}')),
dots AS (
  SELECT ue.vec_id, p.t, p.j, sum(ue.val * p.w) AS dot
  FROM ue JOIN p USING (i) GROUP BY ue.vec_id, p.t, p.j
),
pat AS (
  SELECT vec_id, t,
         CAST(sum(CASE WHEN dot > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS pattern
  FROM dots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS u, b.vec_id AS v
  FROM pat a JOIN pat b ON a.t = b.t AND a.pattern = b.pattern
                        AND a.vec_id < b.vec_id
)
SELECT c.u, c.v, round(list_cosine_similarity(ea.emb, eb.emb), 6) AS cosine
FROM cand c JOIN e ea ON ea.vec_id = c.u JOIN e eb ON eb.vec_id = c.v
WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.3
"""


def q_cosine_pairs_exact(sf_dir: str):
    """Exact all-pairs cosine ≥ 0.3 via the blocked distributed cross join
    (stages/crossjoin.py) — recall-1.0 oracle twin of the LSH candidate
    path, no broadcast or driver-side O(n) structure."""
    from sick_ray.stages.crossjoin import all_pairs_cosine

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return all_pairs_cosine(ds, threshold=0.3, n_blocks=4, num_partitions=8)


SQL_COSINE_PAIRS_EXACT = """
SELECT a.vec_id AS u, b.vec_id AS v,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.3
"""


def q_ngram_allpairs_jaccard(sf_dir: str):
    """EXACT all-pairs k-shingle Jaccard ≥ 0.5 over documents via a
    distributed inverted index — no LSH approximation anywhere, so the
    pair set is deterministic and a DuckDB self-join oracle reproduces it
    row-exactly (the engine-as-its-own-oracle discipline of the
    reference's cross-implementation conformance tests,
    json-sick/SickTests.cs:202-204).

    Plan: explode per-doc DISTINCT shingle hashes, each row carrying its
    doc's set size (8 extra bytes/row beats a second O(n_docs) join) →
    co-locate by shingle (grouped_apply) → emit within-group doc pairs →
    sum pair multiplicities = |A∩B| (map-side partial combine before the
    pair shuffle) → integer threshold 3·inter ≥ |A|+|B| ⇔ J ≥ 0.5 (no
    float compare to drift from SQL). Only narrow int64 rows ever move.
    At web scale a shingle shared by g docs emits C(g,2) pairs — cap
    document frequency first (stopword-shingle removal), which changes
    semantics and so stays out of the oracle-checked query."""
    from sick_ray.shuffle import segment_pairs
    from sick_ray.stages.minhash import shingle_hashes, tokenize_hashes_col

    k = QCFG.shingle_k
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        th, toff = tokenize_hashes_col(batch.column("text"), seed=QCFG.seed)
        sh, soff = shingle_hashes(th, toff, k)
        n = batch.num_rows
        counts = soff[1:] - soff[:-1]
        doc_of = np.repeat(np.arange(n), counts)
        order = np.lexsort((sh, doc_of))
        sh_s, doc_s = sh[order], doc_of[order]
        keep = np.ones(len(sh_s), dtype=bool)
        if len(sh_s) > 1:
            keep[1:] = (sh_s[1:] != sh_s[:-1]) | (doc_s[1:] != doc_s[:-1])
        sh_u, doc_u = sh_s[keep], doc_s[keep]
        sizes = np.zeros(n, dtype=np.int64)
        np.add.at(sizes, doc_u, 1)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "s": pa.array(sh_u.view(np.int64)),
            "d": pa.array(did[doc_u]),
            "sz": pa.array(sizes[doc_u]),
        })

    ex = docs.map_batches(explode, batch_format="pyarrow")

    def pairs_fn(part: pa.Table) -> pa.Table:
        s = part.column("s").to_numpy(zero_copy_only=False)
        d = part.column("d").to_numpy(zero_copy_only=False)
        sz = part.column("sz").to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        s, d, sz = s[order], d[order], sz[order]
        # exactness requires every pair: cap is effectively unbounded
        i, j, _, _ = segment_pairs(s, cap=1 << 60)
        u, v, su, sv = d[i], d[j], sz[i], sz[j]
        swap = u > v
        return pa.table({
            "u": pa.array(np.where(swap, v, u)),
            "v": pa.array(np.where(swap, u, v)),
            "size_u": pa.array(np.where(swap, sv, su)),
            "size_v": pa.array(np.where(swap, su, sv)),
            "cnt": pa.array(np.ones(len(u), dtype=np.int64)),
        })

    pair_rows = grouped_apply(ex, ["s"], pairs_fn, num_partitions=QCFG.num_partitions)

    def _combine(tbl: pa.Table, final: bool) -> pa.Table:
        if tbl.num_rows == 0:
            cols = ["u", "v", "inter", "size_u", "size_v"] if final else None
            return (
                pa.table({c: pa.array([], type=pa.int64()) for c in cols})
                if final else tbl
            )
        u = tbl.column("u").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        su = tbl.column("size_u").to_numpy(zero_copy_only=False)
        sv = tbl.column("size_v").to_numpy(zero_copy_only=False)
        cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v, su, sv, cnt = u[order], v[order], su[order], sv[order], cnt[order]
        fm = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            fm[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(fm)
        inter = np.add.reduceat(cnt, starts)
        u, v, su, sv = u[starts], v[starts], su[starts], sv[starts]
        if final:
            keep = 3 * inter >= su + sv
            return pa.table({
                "u": pa.array(u[keep]), "v": pa.array(v[keep]),
                "inter": pa.array(inter[keep]),
                "size_u": pa.array(su[keep]), "size_v": pa.array(sv[keep]),
            })
        return pa.table({
            "u": pa.array(u), "v": pa.array(v),
            "size_u": pa.array(su), "size_v": pa.array(sv),
            "cnt": pa.array(inter),
        })

    return grouped_apply(
        pair_rows, ["u", "v"], lambda t: _combine(t, True),
        num_partitions=QCFG.num_partitions,
        partial=lambda t: _combine(t, False),
    )


# k-shingles as space-joined token strings; [0-9a-z]+ over lower(text) is
# byte-exact with the engine's tokenizer on ASCII corpora (minhash.py:47-56);
# docs with 0 < n_tok < k contribute ONE whole-doc shingle (shingle_hashes
# short-doc rule); 3*inter >= size_u+size_v is J >= 0.5 in integers.
SQL_NGRAM_ALLPAIRS_JACCARD = """
WITH ex AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(CASE
      WHEN len(t) >= 5 THEN
        [array_to_string(t[i:i+4], ' ') for i in generate_series(1, len(t)-4)]
      WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
      ELSE CAST([] AS VARCHAR[]) END) AS s
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z]+') AS t
          FROM documents)
  )
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.u, p.v, p.inter, su.sz AS size_u, sv.sz AS size_v
FROM pairs p
JOIN sizes su ON su.doc_id = p.u
JOIN sizes sv ON sv.doc_id = p.v
WHERE 3 * p.inter >= su.sz + sv.sz
"""

# the LSH-candidates + exact-verify path emits the same pair SET as the
# exhaustive inverted index at this corpus (recall checked empirically and
# by the driver's hash compare) — its oracle is the same query projected
# to the pair columns, kept in lockstep by construction
SQL_NGRAM_EXACT_PAIRS = SQL_NGRAM_ALLPAIRS_JACCARD.replace(
    "SELECT p.u, p.v, p.inter, su.sz AS size_u, sv.sz AS size_v",
    "SELECT p.u, p.v",
)

# the capped variant's semantics are deterministic and SQL-expressible:
# shingles whose GLOBAL document frequency exceeds df_cap are excluded
# from pair emission (grouped_apply co-locates every row of a shingle, so
# the engine's per-group size IS the global df), while per-doc set sizes
# stay pre-cap (explode computes sz before any capping) — so the oracle
# is the exact query with one extra HAVING-filtered shingle CTE joined
# into pair emission. df_cap here must match q_ngram_allpairs_capped's
# default (32), which is what the driver invokes.
SQL_NGRAM_ALLPAIRS_CAPPED = SQL_NGRAM_ALLPAIRS_JACCARD.replace(
    """), sizes AS (""",
    """), kept AS (
  SELECT s FROM ex GROUP BY s HAVING count(*) <= 32
), sizes AS (""",
).replace(
    "FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id",
    "FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id\n"
    "  JOIN kept k ON k.s = a.s",
)


def q_ngram_allpairs_capped(sf_dir: str, df_cap: int = 32,
                            out_dir: str | None = None,
                            counters_out: dict | None = None):
    """The 100-TB path of the n-gram inverted index: shingles shared by
    more than ``df_cap`` docs (stopword/boilerplate shingles — each emits
    C(g,2) pairs, the quadratic blowup the oracle-checked exact query
    documents and defers) are DROPPED before pair emission, with the
    shortfall COUNTED, never silent: skipped_shingles / skipped_pairs
    counter rows ride the pair stream (kind=2) and surface through
    ``counters_out`` (caller dict) and, when ``out_dir`` is given, a
    _MANIFEST.json there — never a fixed path two concurrent runs would
    clobber. The cap is deterministic (grouped_apply co-locates a
    shingle's every row, so per-group size = global df) and SQL-expressible,
    so this query is oracle-checked too (SQL_NGRAM_ALLPAIRS_CAPPED: the
    exact twin plus a HAVING df<=cap shingle filter); intersection counts
    are a lower bound, so emitted pairs ⊆ the exact query's pairs."""
    import json as _json
    import os as _os

    from sick_ray.shuffle import segment_pairs
    from sick_ray.stages.minhash import shingle_hashes, tokenize_hashes_col

    k = QCFG.shingle_k
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        th, toff = tokenize_hashes_col(batch.column("text"), seed=QCFG.seed)
        sh, soff = shingle_hashes(th, toff, k)
        n = batch.num_rows
        counts = soff[1:] - soff[:-1]
        doc_of = np.repeat(np.arange(n), counts)
        order = np.lexsort((sh, doc_of))
        sh_s, doc_s = sh[order], doc_of[order]
        keep = np.ones(len(sh_s), dtype=bool)
        if len(sh_s) > 1:
            keep[1:] = (sh_s[1:] != sh_s[:-1]) | (doc_s[1:] != doc_s[:-1])
        sh_u, doc_u = sh_s[keep], doc_s[keep]
        sizes = np.zeros(n, dtype=np.int64)
        np.add.at(sizes, doc_u, 1)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "s": pa.array(sh_u.view(np.int64)),
            "d": pa.array(did[doc_u]),
            "sz": pa.array(sizes[doc_u]),
        })

    ex = docs.map_batches(explode, batch_format="pyarrow")

    def pairs_capped(part: pa.Table) -> pa.Table:
        empty = pa.table({
            "u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64()),
            "size_u": pa.array([], type=pa.int64()),
            "size_v": pa.array([], type=pa.int64()),
            "cnt": pa.array([], type=pa.int64()),
            "kind": pa.array([], type=pa.int8()),
        })
        if part.num_rows == 0:
            return empty
        s = part.column("s").to_numpy(zero_copy_only=False)
        d = part.column("d").to_numpy(zero_copy_only=False)
        sz = part.column("sz").to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        s, d, sz = s[order], d[order], sz[order]
        # df cap: whole shingle groups above df_cap are dropped, counted
        fm = first_mask(s)
        starts = np.flatnonzero(fm)
        gsz = np.diff(np.append(starts, len(s)))
        big = gsz > df_cap
        skipped_shingles = int(big.sum())
        skipped_pairs = int((gsz[big] * (gsz[big] - 1) // 2).sum())
        keep_row = ~np.repeat(big, gsz)
        s, d, sz = s[keep_row], d[keep_row], sz[keep_row]
        i, j, _, _ = segment_pairs(s, cap=1 << 60)
        u, v, su, sv = d[i], d[j], sz[i], sz[j]
        swap = u > v
        out = {
            "u": np.where(swap, v, u), "v": np.where(swap, u, v),
            "size_u": np.where(swap, sv, su), "size_v": np.where(swap, su, sv),
            "cnt": np.ones(len(u), dtype=np.int64),
            "kind": np.zeros(len(u), dtype=np.int8),
        }
        if skipped_shingles:
            out = {c: np.append(out[c], x) for c, x in zip(
                out, [skipped_shingles, skipped_pairs, 0, 0, 0, 2])}
        return pa.table({c: pa.array(out[c].astype(np.int64) if c != "kind"
                                     else out[c].astype(np.int8))
                         for c in out})

    from sick_ray.shuffle import collect_counter_rows, kind_filter

    counters = {"df_cap": df_cap}
    raw = collect_counter_rows(
        grouped_apply(ex, ["s"], pairs_capped, num_partitions=QCFG.num_partitions),
        counters, "skipped_shingles", "skipped_pairs",
    )
    if counters_out is not None:
        counters_out.update(counters)
    if out_dir is not None:
        _os.makedirs(out_dir, exist_ok=True)
        with open(f"{out_dir}/_MANIFEST.json", "w") as f:
            _json.dump(counters, f)

    pair_rows = raw.map_batches(
        lambda b: kind_filter(0)(b).drop_columns(["kind"]),
        batch_format="pyarrow",
    )

    def combine(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in ["u", "v", "inter", "size_u", "size_v"]})
        u = tbl.column("u").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        su = tbl.column("size_u").to_numpy(zero_copy_only=False)
        sv = tbl.column("size_v").to_numpy(zero_copy_only=False)
        cn = tbl.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v, su, sv, cn = u[order], v[order], su[order], sv[order], cn[order]
        fm = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            fm[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(fm)
        inter = np.add.reduceat(cn, starts)
        u, v, su, sv = u[starts], v[starts], su[starts], sv[starts]
        keep = 3 * inter >= su + sv
        return pa.table({
            "u": pa.array(u[keep]), "v": pa.array(v[keep]),
            "inter": pa.array(inter[keep]),
            "size_u": pa.array(su[keep]), "size_v": pa.array(sv[keep]),
        })

    return grouped_apply(
        pair_rows, ["u", "v"], combine, num_partitions=QCFG.num_partitions
    )


def _top_terms_impl(sf_dir: str, cap: int | None, k_out: int = 20):
    """Shared distributed word-count top-k: vectorized per-batch token
    counting (tokenize_hashes byte path) feeding a hash-partitioned count
    shuffle keyed by the token HASH (narrow rows); the winning hashes'
    string forms ride along, and the driver merges only per-partition
    top-k partials. ``cap=None`` → exact counts; otherwise each batch's
    counts are Misra-Gries-compressed to ≤ cap counters before the
    shuffle (one code path for the exact query and its sketch twin, so a
    tie-break or tokenizer fix can never drift between them)."""
    from sick_ray.functions.curate import slice_token_strings
    from sick_ray.functions.sketch import mg_compress_counts
    from sick_ray.stages.minhash import tokenize_hashes_col

    docs = _read(sf_dir, "documents", columns=["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        th, _offs, t_start, t_end, low = tokenize_hashes_col(col, return_spans=True)
        h = th.view(np.int64)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        fm = first_mask(hs)
        starts = np.flatnonzero(fm)
        cnt = np.diff(np.append(starts, len(hs)))
        if cap is not None:
            cnt, _off = mg_compress_counts(cnt, cap)
        keep = cnt > 0
        rep_idx = order[fm][keep]
        if t_start is not None:
            # one vectorized ragged copy for ALL distinct tokens, straight
            # out of the lowercased byte buffer the hashes were computed
            # over (no second tokenization pass, no per-token Python)
            rep = slice_token_strings(low, t_start[rep_idx], t_end[rep_idx])
        else:
            # non-ASCII fallback: recover strings with the exact tokenizer
            import re as _re

            toks = []
            for t in col.to_pylist():
                toks.extend(_re.findall(r"[^\W_]+", (t or "").lower()))
            rep = pa.array(np.asarray(toks, dtype=object)[rep_idx],
                           type=pa.large_string())
        return pa.table(
            {
                "h": pa.array(hs[fm][keep], type=pa.int64()),
                "token": rep,
                "n": pa.array(cnt[keep], type=pa.int64()),
            }
        )

    def reduce_topk(part: pa.Table) -> pa.Table:
        h = part.column("h").to_numpy(zero_copy_only=False)
        n = part.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, ns = h[order], n[order]
        fm = first_mask(hs)
        starts = np.flatnonzero(fm)
        tot = np.add.reduceat(ns, starts)
        toks = part.column("token").take(pa.array(order[fm]))
        kk = min(k_out, len(tot))
        # per-partition top-k with the FINAL tie-break applied locally
        # ((-n, token asc)): a count-only argpartition can keep the wrong
        # token when counts tie exactly at the k boundary
        toks_np = np.asarray(toks.to_pylist(), dtype=object)
        top = np.lexsort((toks_np, -tot))[:kk]
        return pa.table(
            {
                "token": toks.take(pa.array(top)),
                "n": pa.array(tot[top], type=pa.int64()),
            }
        )

    parts = grouped_apply(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        ["h"],
        reduce_topk,
        num_partitions=8,
    ).to_pandas()
    out = parts.sort_values(["n", "token"], ascending=[False, True]).head(k_out)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def q_top_terms(sf_dir: str):
    """Corpus-wide term frequency top-20, EXACT — see _top_terms_impl."""
    return _top_terms_impl(sf_dir, cap=None)


SQL_TOP_TERMS = """
SELECT t AS token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_extract_all(lower(text), '[0-9a-z]+')) AS t FROM documents
) GROUP BY t ORDER BY n DESC, token LIMIT 20
"""


def q_user_running_value(sf_dir: str):
    """Per-user running cumulative sum over the time-ordered event stream —
    windowed aggregate via hash partition by user + segmented cumsum."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def running(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], type=pa.int64()),
                 "running_value": pa.array([], type=pa.float64())}
            )
        uid = part.column("user_id").to_numpy(zero_copy_only=False)
        ts = part.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        val = part.column("value").to_numpy(zero_copy_only=False)
        eid = part.column("event_id").to_numpy(zero_copy_only=False)
        order = sort_index(uid, ts, eid)
        u_s, v_s, e_s = uid[order], val[order], eid[order]
        fm = first_mask(u_s)
        cs = np.cumsum(v_s)
        # exact per-group base subtraction (a maximum.accumulate over group
        # bases is only correct when the global cumsum is non-decreasing,
        # i.e. it silently breaks on negative values — refunds/adjustments)
        starts = np.flatnonzero(fm)
        counts = np.diff(np.append(starts, len(v_s)))
        run = cs - np.repeat(cs[starts] - v_s[starts], counts)
        return pa.table(
            {
                "event_id": pa.array(e_s, type=pa.int64()),
                "running_value": pa.array(np.round(run, 2), type=pa.float64()),
            }
        )

    return grouped_apply(ev, ["user_id"], running, num_partitions=QCFG.num_partitions)


SQL_USER_RUNNING_VALUE = """
SELECT event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events
"""


def q_prev_event_value(sf_dir: str):
    """As-of self join: each event paired with the user's most recent
    PRIOR event value (NULL for the first) — ordered merge per user
    partition, the merge-as-of pattern."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def prev(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], type=pa.int64()),
                 "prev_value": pa.array([], type=pa.float64())}
            )
        uid = part.column("user_id").to_numpy(zero_copy_only=False)
        ts = part.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        val = part.column("value").to_numpy(zero_copy_only=False)
        eid = part.column("event_id").to_numpy(zero_copy_only=False)
        order = sort_index(uid, ts, eid)
        u_s, v_s, e_s = uid[order], val[order], eid[order]
        fm = first_mask(u_s)
        pv = np.empty(len(v_s))
        pv[1:] = v_s[:-1]
        pv[0] = np.nan
        pv[fm] = np.nan
        return pa.table(
            {
                "event_id": pa.array(e_s, type=pa.int64()),
                "prev_value": pa.array(np.round(pv, 2), type=pa.float64(),
                                       from_pandas=True),
            }
        )

    return grouped_apply(ev, ["user_id"], prev, num_partitions=QCFG.num_partitions)


SQL_PREV_EVENT_VALUE = """
SELECT event_id,
       round(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
         AS prev_value
FROM events
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: customer membership via shuffle.semi_select (keys
    assembled in-cluster, broadcast below the 2M switch, Bloom-prefiltered
    left-semi join above — the driver never pulls the customer table),
    BIG-BIG distributed hash join (orders ⋈ lineitem via Dataset.join),
    grouped revenue, partial top-k merge."""
    from sick_ray.shuffle import semi_select

    cutoff = np.datetime64("1998-01-01", "us")

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def building_keys(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("c_mktsegment"), "BUILDING")
        return pa.table({"o_custkey": batch.column("c_custkey").filter(m)})

    keys = cust.map_batches(building_keys, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def date_filter(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(od < cutoff))

    orders = semi_select(
        orders.map_batches(date_filter, batch_format="pyarrow"),
        keys, on="o_custkey", num_partitions=QCFG.num_partitions,
    ).select_columns(["o_orderkey", "o_orderdate"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def filter_li(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        m = sd >= cutoff
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").filter(pa.array(m)),
                "rev": pa.array((ep * (1 - dc))[m], type=pa.float64()),
            }
        )

    joined = li.map_batches(filter_li, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=join_partitions(QCFG.num_partitions),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def agg(part: pa.Table) -> pa.Table:
        ok = part.column("l_orderkey").to_numpy(zero_copy_only=False)
        rev = part.column("rev").to_numpy(zero_copy_only=False)
        od = part.column("o_orderdate").to_numpy(zero_copy_only=False)
        order = sort_index(ok)
        ks, rs = ok[order], rev[order]
        fm = first_mask(ks)
        starts = np.flatnonzero(fm)
        tot = np.add.reduceat(rs, starts)
        grp_keys = ks[fm]
        k = min(10, len(tot))
        # final tie-break applied LOCALLY before truncation: a count-only
        # argpartition keeps an arbitrary orderkey when revenues tie exactly
        # at the k boundary, while the oracle breaks ties by orderkey asc
        top = np.lexsort((grp_keys, -tot))[:k]
        return pa.table(
            {
                "l_orderkey": pa.array(grp_keys[top], type=pa.int64()),
                "revenue": pa.array(tot[top], type=pa.float64()),
                "o_orderdate": pa.array(od[order][fm][top]),
            }
        )

    parts = grouped_apply(
        joined, ["l_orderkey"], agg, num_partitions=QCFG.num_partitions
    ).to_pandas()
    out = parts.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    out["revenue"] = out["revenue"].round(2)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate >= TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_json_subtree_stats(sf_dir: str):
    """Arbitrary nested-JSON traversal + subtree hash-consing
    (functions/traverse.py — the CirceTraverser.traverse analogue): build
    a nested document per event, flatten every subtree bottom-up with
    structural hashes, and measure corpus-wide structural sharing
    (total vs distinct subtrees per kind), i.e. sick's dedup effect."""
    from sick_ray.functions.traverse import subtree_stats

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "props"])

    def build_doc(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch.column("event_id"), pa.string())
        uid = pc.cast(batch.column("user_id"), pa.string())
        j = pc.binary_join_element_wise(
            '{"meta":{"ids":[', eid, ",", uid, '],"type":"',
            batch.column("event_type"), '"},"p":', batch.column("props"), "}",
            "",
        )
        return pa.table({"event_id": batch.column("event_id"), "j": j})

    docs = ev.map_batches(build_doc, batch_format="pyarrow")
    return subtree_stats(docs, col="j", id_col="event_id", num_partitions=8)


# per doc {"meta":{"ids":[eid,uid],"type":t},"p":{"k":k}}: subtrees are
# 3 ints (eid, uid, k), 1 str (t), 1 arr ([eid,uid]), 3 objs (meta, p,
# root). Distincts: ints = |{eid} ∪ {uid} ∪ {k}| as values; arr/meta/root
# are unique per row (event_id is a key); p objects = distinct k.
SQL_JSON_SUBTREE_STATS = """
WITH k AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS kv FROM events)
SELECT * FROM (
  SELECT 'arr' AS kind, CAST(count(*) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS n_distinct FROM events
  UNION ALL
  SELECT 'int', CAST(3 * count(*) AS BIGINT),
         (SELECT CAST(count(*) AS BIGINT) FROM
            (SELECT event_id AS v FROM events
             UNION SELECT user_id FROM events
             UNION SELECT kv FROM k))
  FROM events
  UNION ALL
  SELECT 'obj', CAST(3 * count(*) AS BIGINT),
         CAST(2 * count(*) + (SELECT count(DISTINCT kv) FROM k) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'str', CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT event_type) AS BIGINT) FROM events
) ORDER BY kind
"""


def q_lineitem_decimal_totals(sf_dir: str):
    """Exact decimal money totals (functions/narrow.py decimal_sum — the
    reference's BigDecimal path, EBACodecs.scala:367-400): overflow-safe
    integer-unit arithmetic end to end into a decimal128(38,2) column,
    rendered as canonical strings for the oracle compare. No float
    accumulation anywhere."""
    from sick_ray.functions.narrow import decimal_sum

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    out = decimal_sum(li, "l_extendedprice", "l_returnflag")
    i = out.schema.get_field_index("total")
    return out.set_column(i, "total", pc.cast(out.column("total"), pa.string()))


SQL_LINEITEM_DECIMAL_TOTALS = """
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS total
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_narrow_int_widths(sf_dir: str):
    """Lossless minimal-width selection per integer column (functions/
    narrow.py — the byte/short/int/long ladder of
    CirceTraverser.scala:101-156): global min/max aggregate → width."""
    from sick_ray.functions.narrow import narrow_types

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    li = _read(sf_dir, "lineitem", columns=cols)
    types = narrow_types(li, cols)
    names = sorted(types)
    return pa.table(
        {
            "col": pa.array(names, type=pa.string()),
            "width": pa.array([types[c][1] for c in names], type=pa.int64()),
        }
    )


SQL_NARROW_INT_WIDTHS = """
SELECT col, CAST(CASE WHEN lo >= -128 AND hi <= 127 THEN 1
                      WHEN lo >= -32768 AND hi <= 32767 THEN 2
                      WHEN lo >= -2147483648 AND hi <= 2147483647 THEN 4
                      ELSE 8 END AS BIGINT) AS width
FROM (
  SELECT 'l_orderkey' AS col, min(l_orderkey) AS lo, max(l_orderkey) AS hi FROM lineitem
  UNION ALL SELECT 'l_partkey', min(l_partkey), max(l_partkey) FROM lineitem
  UNION ALL SELECT 'l_suppkey', min(l_suppkey), max(l_suppkey) FROM lineitem
  UNION ALL SELECT 'l_linenumber', min(l_linenumber), max(l_linenumber) FROM lineitem
) ORDER BY col
"""


def q_winnow_fp_docs(sf_dir: str):
    """Winnowing fingerprints (8 smallest anchored window hashes per doc)
    as scalar columns w0..w7, oracled against the independent scalar
    golden table (scripts/make_golden.py)."""
    from sick_ray.functions.text import add_winnow_fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    with_fp = docs.map_batches(add_winnow_fingerprint, batch_format="pyarrow")

    def explode_fp(batch: pa.Table) -> pa.Table:
        col = batch.column("winnow_fp")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        w = col.flatten().to_numpy(zero_copy_only=False).reshape(batch.num_rows, -1)
        cols = {"doc_id": batch.column("doc_id")}
        for i in range(w.shape[1]):
            cols[f"w{i}"] = pa.array(w[:, i], type=pa.int64())
        return pa.table(cols)

    return with_fp.map_batches(explode_fp, batch_format="pyarrow")


SQL_WINNOW_FP_DOCS = f"""
SELECT d.doc_id, {', '.join(f'g.w{i}' for i in range(8))}
FROM documents d JOIN read_parquet('{GOLDEN}') g
  ON g.doc_id = d.doc_id AND g.text_md5 = md5(coalesce(d.text, ''))
"""


def q_events_asof_purchase(sf_dir: str):
    """Two-sided AS-OF join (stages/joins.py): each click paired with the
    same user's most recent purchase at or before it (inner, backward).
    Tagged-union hash shuffle by user + one vectorized searchsorted merge
    per partition — no per-row Python, no cross-partition state."""
    from sick_ray.stages.joins import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type", "value"])
    def typed(kind):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("event_type"), kind))

        return f

    clicks = ev.map_batches(typed("click"), batch_format="pyarrow")
    purchases = ev.map_batches(typed("purchase"), batch_format="pyarrow")
    joined = asof_join(
        clicks, purchases, by="user_id", on="ts",
        left_cols=["event_id", "value"], right_cols=["value"],
        num_partitions=QCFG.num_partitions,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("l_event_id"),
                "click_value": pc.round(batch.column("l_value"), 2),
                "purchase_ts": batch.column("r_t"),
                "purchase_value": pc.round(batch.column("r_value"), 2),
            }
        )

    return joined.map_batches(rename, batch_format="pyarrow")


SQL_EVENTS_ASOF_PURCHASE = """
SELECT a.event_id AS event_id,
       round(a.value, 2) AS click_value,
       b.ts AS purchase_ts,
       round(b.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


def q_events_range_count(sf_dir: str):
    """Keyed RANGE join + aggregate (stages/joins.py): per event, count and
    sum of the same user's events strictly within the prior 10 minutes.
    Interval probe = two searchsorted calls on a composite (key, time)
    int64; the sum reads a prefix-sum of the time-sorted values."""
    from sick_ray.stages.joins import range_join_agg

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = range_join_agg(
        ev, ev, by="user_id", on="ts", value_col="value",
        window_us=10 * 60 * 1_000_000,
        left_cols=["event_id"], num_partitions=QCFG.num_partitions,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("l_event_id"),
                "n_prior_10m": batch.column("n_in_range"),
                "sum_prior_10m": pc.round(batch.column("sum_in_range"), 2),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


SQL_EVENTS_RANGE_COUNT = """
SELECT a.event_id,
       count(b.event_id) AS n_prior_10m,
       round(coalesce(sum(b.value), 0), 2) AS sum_prior_10m
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 10 MINUTE
 AND b.ts < a.ts
GROUP BY a.event_id
"""


# ------------------------------------------------- training-data curation

def q_gopher_repetition(sf_dir: str):
    """Gopher-style repetition quality filter (Rae et al. 2021): per doc,
    top-token multiplicity and duplicate-5-gram fraction as exact ppm
    integers + a keep flag. Pure per-document map — zero shuffle; the
    token work reuses the dedup stages' zero-copy byte tokenizer."""
    from sick_ray.functions.curate import add_repetition_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(add_repetition_stats, batch_format="pyarrow")


SQL_GOPHER_REPETITION = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z]+') AS l
  FROM documents
),
tok AS (SELECT doc_id, unnest(l) AS tok FROM t),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
tstats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(max(c) AS BIGINT) AS top_token_n
  FROM cnt GROUP BY doc_id
),
ge AS (
  SELECT doc_id,
         unnest([array_to_string(l[i:i+4], ' ')
                 for i in generate_series(1, greatest(len(l) - 4, 0))]) AS g
  FROM t
),
gstats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_5grams,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_5grams
  FROM ge GROUP BY doc_id
),
j AS (
  SELECT d.doc_id,
         coalesce(tstats.n_tokens, 0) AS n_tokens,
         coalesce(tstats.top_token_n, 0) AS top_token_n,
         coalesce(gstats.n_5grams, 0) AS n_5grams,
         coalesce(gstats.n_distinct_5grams, 0) AS n_distinct_5grams
  FROM documents d
  LEFT JOIN tstats USING (doc_id) LEFT JOIN gstats USING (doc_id)
)
SELECT doc_id, n_tokens, top_token_n, n_5grams, n_distinct_5grams,
       CAST(floor(top_token_n * 1000000.0 / greatest(n_tokens, 1))
            AS BIGINT) AS top_token_ppm,
       CAST(floor((n_5grams - n_distinct_5grams) * 1000000.0
                  / greatest(n_5grams, 1)) AS BIGINT) AS dup_5gram_ppm,
       CAST(CASE WHEN floor(top_token_n * 1000000.0 / greatest(n_tokens, 1))
                      <= 200000
                  AND floor((n_5grams - n_distinct_5grams) * 1000000.0
                            / greatest(n_5grams, 1)) <= 300000
             THEN 1 ELSE 0 END AS BIGINT) AS gopher_keep
FROM j
"""


def q_pii_redact_docs(sf_dir: str):
    """PII redaction (email + phone masking) with match counts. The synth
    corpus contains no PII, so both sides deterministically augment the
    text from doc_id before redacting — the kernel is exercised with
    nonzero matches while staying self-contained. RE2 on both sides
    (pyarrow.compute and DuckDB), identical replace order."""
    from sick_ray.functions.curate import redact_pii

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        ids_s = pc.cast(ids, pa.string())
        tail = pc.utf8_lpad(
            pc.cast(pc.subtract(ids, pc.multiply(pc.divide(ids, 10000), 10000)),
                    pa.string()),
            4, "0",
        )
        aug = pc.binary_join_element_wise(
            batch.column("text"), " contact user", ids_s,
            "@example.com or call 555-", tail, " now", "",
        )
        return pa.table({"doc_id": ids, "aug": aug})

    return docs.map_batches(augment, batch_format="pyarrow").map_batches(
        lambda b: redact_pii(b, text_col="aug"), batch_format="pyarrow"
    )


_EMAIL_SQL = r"[0-9A-Za-z._%+\-]+@[0-9A-Za-z.\-]+\.[A-Za-z]{2,}"
_PHONE_SQL = r"\b[0-9]{3}-[0-9]{4}\b"
SQL_PII_REDACT_DOCS = f"""
WITH a AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
         AS aug
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{_EMAIL_SQL}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(
              regexp_replace(aug, '{_EMAIL_SQL}', '<EMAIL>', 'g'),
              '{_PHONE_SQL}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(aug, '{_EMAIL_SQL}', '<EMAIL>', 'g'),
                      '{_PHONE_SQL}', '<PHONE>', 'g') AS redacted
FROM a
"""


def q_sample_docs(sf_dir: str):
    """Deterministic 10% hash sample (Knuth multiplicative on doc_id).
    Stateless per-row predicate — the 100-TB sampling path: any engine
    reproduces the same sample from the same ids, and resharding or
    re-running never changes membership."""
    from sick_ray.functions.curate import hash_sample_mask

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "source", "n_chars"])

    def flt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(hash_sample_mask(ids, 10, 3)))

    return docs.map_batches(flt, batch_format="pyarrow")


def q_weighted_mix_docs(sf_dir: str):
    """Source-weighted data mixing: per-source keep RATES (here derived
    deterministically from the source name: srcN keeps (1 + N mod 10) x
    10%) applied as a stateless per-row hash predicate — how a training
    mix up- or down-weights corpora without materializing intermediate
    copies. Same Knuth-hash membership (and HUGEINT SQL twin) as
    sample_docs; resharding never changes the mix."""
    from sick_ray.functions.curate import weighted_sample_mask

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "source", "n_chars"])

    def flt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src_num = pc.cast(
            pc.utf8_slice_codeunits(batch.column("source"), 3, 2**30),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        rate = (1 + src_num % 10) * 100
        return batch.filter(pa.array(weighted_sample_mask(ids, rate)))

    return docs.map_batches(flt, batch_format="pyarrow")


SQL_WEIGHTED_MIX_DOCS = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE ((doc_id::HUGEINT * 2654435761) % 4294967296) % 1000
      < (1 + CAST(substr(source, 4) AS BIGINT) % 10) * 100
"""


SQL_SAMPLE_DOCS = """
-- HUGEINT cast: doc_id * 2654435761 overflows INT64 for doc_id >= ~3.47e9
-- (the 100-TB id range); the kernel's uint64 wrap is harmless because
-- 2^32 | 2^64, so both sides compute exactly (id * K) mod 2^32
SELECT doc_id, lang, source, n_chars FROM documents
WHERE ((doc_id::HUGEINT * 2654435761) % 4294967296) % 10 = 3
"""


N_PACK_SHARDS = 8
PACK_BUDGET = 2048  # tokens per training sequence


def q_pack_sequences(sf_dir: str):
    """Training-sequence packing (concatenate-and-chunk, the GPT-style
    pretraining layout): docs are hash-sharded (``doc_id % N_PACK_SHARDS``
    — deterministic and reshard-invariant; at 100-TB scale the shard
    count grows so each shard's token stream packs independently in
    parallel), concatenated in doc_id order within the shard with one
    EOS token after each doc, and cut into fixed ``PACK_BUDGET``-token
    sequences. Each doc row reports the sequences covering it
    (``seq_start``..``seq_end``) and its offset in the first one — all
    exact integers, so the oracle is a plain SQL window cumsum (no
    recursion; greedy no-split packing would need one).

    Shuffle weight: 24 B/row (doc_id, token_count, shard int64s) — text
    never moves. The per-shard fold is one sorted cumsum (vectorized)."""
    from sick_ray.functions.text import add_token_count

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shard_of(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.select(["doc_id", "token_count"]).append_column(
            "shard", pa.array(did % N_PACK_SHARDS, pa.int64())
        )

    slim = docs.map_batches(add_token_count, batch_format="pyarrow").map_batches(
        shard_of, batch_format="pyarrow"
    )

    def pack(group: pa.Table) -> pa.Table:
        g = group.take(pc.sort_indices(group, sort_keys=[("doc_id", "ascending")]))
        tok = g.column("token_count").to_numpy(zero_copy_only=False) + 1  # +EOS
        start = np.cumsum(tok) - tok
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "shard": g.column("shard"),
                "tok": pa.array(tok, pa.int64()),
                "seq_start": pa.array(start // PACK_BUDGET, pa.int64()),
                "seq_end": pa.array((start + tok - 1) // PACK_BUDGET, pa.int64()),
                "seq_offset": pa.array(start % PACK_BUDGET, pa.int64()),
            }
        )

    return slim.groupby("shard").map_groups(pack, batch_format="pyarrow")


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_extract_all(text, '[0-9A-Za-z]+')) AS BIGINT) + 1 AS tok
  FROM documents
), c AS (
  SELECT doc_id, shard, tok,
         SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - tok AS start_pos
  FROM t
)
SELECT doc_id, shard, tok,
       CAST(start_pos // 2048 AS BIGINT) AS seq_start,
       CAST((start_pos + tok - 1) // 2048 AS BIGINT) AS seq_end,
       CAST(start_pos % 2048 AS BIGINT) AS seq_offset
FROM c
"""


STRATA_QUOTA = 20  # docs kept per language


def q_stratified_sample_docs(sf_dir: str):
    """Stratified quota sampling: the top ``STRATA_QUOTA`` docs PER
    LANGUAGE by quality score (ties broken doc_id-ascending) — how a
    training mix enforces per-language quotas instead of letting a
    head language swamp the corpus. Same partial-top-k shape as
    q_top10_orders (per-batch top-k per stratum, tiny driver merge — no
    global sort); quality is the oracled q_quality_docs formula, so
    both sides rank identical float64 values."""
    from sick_ray.functions.text import add_quality_score

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    scored = docs.map_batches(add_quality_score, batch_format="pyarrow").select_columns(
        ["doc_id", "lang", "quality"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["quality", "doc_id"], ascending=[False, True]
        )
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False, sort=False).head(STRATA_QUOTA),
            preserve_index=False,
        )

    parts = scored.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["quality", "doc_id"], ascending=[False, True])
        .groupby("lang", as_index=False, sort=False)
        .head(STRATA_QUOTA)
    )
    return pa.Table.from_pandas(
        out.sort_values(["lang", "doc_id"]).reset_index(drop=True),
        preserve_index=False,
    )


SQL_STRATIFIED_SAMPLE_DOCS = """
WITH feats AS (
  SELECT doc_id, lang,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digits,
         CAST(len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9A-Za-z]+')) AS DOUBLE) AS n_tokens
  FROM documents
), scored AS (
  SELECT doc_id, lang,
         least(greatest(ln(1 + n_chars) / ln(2000.0), 0), 1) AS len_score,
         least(greatest(1 - abs(
           CASE WHEN n_tokens > 0
                THEN (n_chars - n_tokens + 1) / greatest(n_tokens, 1)
                ELSE 0 END - 5.0) / 10.0, 0), 1) AS tok_score,
         least(greatest(
           1 - 2.0 * (n_digits / greatest(n_chars, 1.0)
                      + n_punct / greatest(n_chars, 1.0)), 0), 1) AS noise_pen
  FROM feats
), q AS (
  SELECT doc_id, lang,
         round(0.4 * len_score + 0.3 * tok_score + 0.3 * noise_pen, 6) AS quality
  FROM scored
)
SELECT doc_id, lang, quality FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY quality DESC, doc_id) AS rk
  FROM q
) WHERE rk <= 20
"""


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: flag any corpus doc sharing an 8-token
    shingle with the benchmark set (here: docs with doc_id % 50 == 0 stand
    in for a held-out eval set). The benchmark side is distinct-shingle
    hashed and assembled in-cluster into one broadcast array (benchmarks
    are MB-scale by nature); the corpus side probes per batch with
    searchsorted — no shuffle, no corpus materialization, no driver
    traffic."""
    from sick_ray.functions.curate import (
        finalize_shingle_set,
        make_contamination_prober,
        shingle_hash_table,
    )
    from sick_ray.shuffle import assemble_blocks

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bench = shingle_hash_table(
        docs, k=8, id_filter_mod=50, id_filter_res=0
    ).materialize()
    # assemble the benchmark hash set in-cluster from the Dataset's own
    # block refs (zero driver traffic — the labels-attach pattern); the
    # task's return ref IS the broadcast handle
    bench_ref = assemble_blocks(
        bench, ["g"], finalize_shingle_set,
        empty=np.empty(0, dtype=np.int64),
    )
    probe = make_contamination_prober(bench_ref, k=8)

    def non_bench(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 50 != 0))

    return docs.map_batches(non_bench, batch_format="pyarrow").map_batches(
        probe, batch_format="pyarrow"
    )


SQL_DECONTAMINATE_DOCS = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z]+') AS l
  FROM documents
),
b AS (
  SELECT DISTINCT
         unnest([array_to_string(l[i:i+7], ' ')
                 for i in generate_series(1, greatest(len(l) - 7, 0))]) AS g
  FROM t WHERE doc_id % 50 = 0
),
ce AS (
  SELECT doc_id,
         unnest([array_to_string(l[i:i+7], ' ')
                 for i in generate_series(1, greatest(len(l) - 7, 0))]) AS g
  FROM t WHERE doc_id % 50 <> 0
),
hit AS (SELECT DISTINCT ce.doc_id FROM ce JOIN b USING (g))
SELECT d.doc_id,
       CAST(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
WHERE d.doc_id % 50 <> 0
"""


def q_embedding_centroids(sf_dir: str):
    """Per-label centroid of the embedding column, long format (label,
    dim, c). Vector aggregate as per-batch float64 partial sums (label
    cardinality is small) + tiny driver combine — the building block for
    IVF training / cluster-balance audits, no shuffle."""
    # import OUTSIDE the batch closure: workers can't import sick_ray (the
    # entry module registers it for by-value pickling; a function-local
    # import would re-resolve by name at call time on the worker)
    from sick_ray.stages.ann import _emb_matrix

    emb = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch.column("embedding")).astype(np.float64)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        labs, counts = np.unique(labels, return_counts=True)
        d = m.shape[1]
        # buffered segmented sum (repo idiom): sort rows by label, then
        # one reduceat per label run — unlike np.add.at this stays
        # vectorized-fast at any batch size / label cardinality
        order = np.argsort(labels, kind="stable")
        starts = np.zeros(len(labs), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        sums = np.add.reduceat(m[order], starts, axis=0)
        return pa.table(
            {
                "label": np.repeat(labs.astype(np.int64), d),
                "dim": np.tile(np.arange(d, dtype=np.int64), len(labs)),
                "s": sums.reshape(-1),
                "n": np.repeat(counts.astype(np.int64), d),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["label", "dim"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum")
    )
    g["c"] = np.round(g["s"] / g["n"], 4)
    g["label"] = g["label"].astype("int64")
    out = g[["label", "dim", "c"]]
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EMBEDDING_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label, i - 1 AS dim,
       round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS c
FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY label, i
"""


def q_chunk_dedup_docs(sf_dir: str, chunk: int = 16):
    """Chunk-level exact dedup (C4/MassiveText repeated-passage removal)
    over the documents table — see functions/curate.py::chunk_dedup for
    the operator core and its 100-TB shape. Output: (doc_id, n_chunks,
    n_kept, text_kept), byte-exact vs the SQL twin."""
    from sick_ray.functions.curate import chunk_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_dedup(docs, chunk=chunk, num_partitions=QCFG.num_partitions)


SQL_CHUNK_DEDUP_DOCS = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+') AS t
  FROM documents
), ch AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+15], ' ')
                 for i in generate_series(1, len(t), 16)]) AS chunk,
         unnest([(i - 1) // 16 for i in generate_series(1, len(t), 16)]) AS idx
  FROM tok WHERE len(t) > 0
), keep AS (
  SELECT doc_id, idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) = 1 AS kept
  FROM ch
), agg AS (
  SELECT doc_id, count(*) AS n_chunks,
         count(*) FILTER (WHERE kept) AS n_kept,
         coalesce(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE kept),
                  '') AS text_kept
  FROM keep GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_chunks, 0) AS n_chunks,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.text_kept, '') AS text_kept
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_cap_per_source(sf_dir: str, cap: int = 10):
    """Hot-source capping (RefinedWeb/C4 per-domain limit): keep at most
    ``cap`` docs per source — deterministically the lowest doc_ids — and
    flag every row. See functions/curate.py::cap_per_source for the
    operator core (per-batch partial top-N, winner-set broadcast, corpus
    never shuffles)."""
    from sick_ray.functions.curate import cap_per_source

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return cap_per_source(docs, cap=cap,
                          num_partitions=QCFG.num_partitions)


SQL_CAP_PER_SOURCE = """
SELECT doc_id, source,
       row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10 AS keep
FROM documents
"""


def q_novelty_docs(sf_dir: str, k: int = 8):
    """Per-doc 8-gram novelty ppm (owner = lowest doc_id containing the
    shingle corpus-wide) — the dedup-effectiveness / memorization-risk
    diagnostic. See functions/curate.py::novelty_stats for the operator
    core (distinct 16 B shingle rows, owner + per-doc partials folded in
    ONE shingle-keyed reduce, narrow doc-keyed combine). The oracle
    recomputes from exact shingle STRINGS; the engine uses 64-bit rolling
    hashes — a collision would undercount one shingle (~n²/2⁶⁴)."""
    from sick_ray.functions.curate import novelty_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return novelty_stats(docs, k=k, num_partitions=QCFG.num_partitions)


SQL_NOVELTY_DOCS = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+') AS l
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(l[i:i+7], ' ')
                 for i in generate_series(1, greatest(len(l) - 7, 0))]) AS g
  FROM t
),
own AS (SELECT g, min(doc_id) AS owner FROM sh GROUP BY g),
agg AS (
  SELECT s.doc_id, count(*) AS n_shingles,
         CAST(count(*) FILTER (WHERE s.doc_id = o.owner) AS BIGINT)
           AS n_novel
  FROM sh s JOIN own o USING (g) GROUP BY s.doc_id
)
SELECT doc_id, n_shingles, n_novel,
       (n_novel * 1000000) // n_shingles AS novel_ppm
FROM agg
"""


def q_source_overlap(sf_dir: str, k: int = 8):
    """Cross-source n-gram leakage matrix: distinct 8-gram shingles
    shared by each unordered source pair — the corpus-overlap audit run
    before mixing corpora. See functions/curate.py::source_overlap
    (distinct shingle-source rows, counted-cap pair emission that raises
    on truncation — counting semantics, never a silent undercount —
    per-partition pair pre-aggregation). Oracle uses exact shingle
    strings; the engine's 64-bit hashes collide with prob ~n²/2⁶⁴."""
    from sick_ray.functions.curate import source_overlap

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return source_overlap(docs, k=k, num_partitions=QCFG.num_partitions)


SQL_SOURCE_OVERLAP = """
WITH t AS (
  SELECT source, regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+') AS l
  FROM documents
),
sh AS (
  SELECT DISTINCT source,
         unnest([array_to_string(l[i:i+7], ' ')
                 for i in generate_series(1, greatest(len(l) - 7, 0))]) AS g
  FROM t
)
SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
GROUP BY 1, 2
"""


def q_dsir_score_docs(sf_dir: str):
    """DSIR-style importance scores (Xie et al. 2023) for corpus docs vs
    a target set (doc_id % 50 == 0, the decontamination convention) — an
    exact integer-ratio variant so the oracle reproduces it exactly. See
    functions/curate.py::dsir_scores (one term-keyed count shuffle,
    target-relevant score table broadcast in-cluster, per-batch
    searchsorted probe — corpus text never shuffles)."""
    from sick_ray.functions.curate import dsir_scores

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dsir_scores(docs, num_partitions=QCFG.num_partitions)


SQL_DSIR_SCORE_DOCS = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+'))
           AS term
  FROM documents
),
tc AS (
  SELECT term,
         sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END) AS t,
         sum(CASE WHEN doc_id % 50 <> 0 THEN 1 ELSE 0 END) AS s
  FROM tok GROUP BY term
),
sc AS (
  SELECT term,
         CASE WHEN s > 0 THEN (t * 1000000000) // s ELSE 0 END AS sc
  FROM tc WHERE t > 0
),
d AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         sum(coalesce(sc.sc, 0)) AS tot
  FROM tok t LEFT JOIN sc USING (term)
  WHERE t.doc_id % 50 <> 0
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       CAST(tot // n_tokens AS BIGINT) AS dsir_score
FROM d
"""


def q_quality_classifier(sf_dir: str):
    """Trained quality classifier: distributed full-batch logistic
    regression over per-doc text features (bias, n_tokens/100, distinct
    ratio, top-token ratio), label = the exact integer lexical-diversity
    rule — the supervised twin of kmeans_embeddings' iterative pattern
    (fasttext-style quality filtering). See stages/classify.py. Output
    (doc_id, label, pred) — integer classes only, so the oracle (the
    SAME 25-iteration GD retrained in a recursive CTE, anchor CAST to
    DOUBLE) compares exactly. VALIDITY DOMAIN: measured min |z| margin
    7.9e-3 (sf0.01) / 4.0e-4 (sf0.1) vs ~1e-13 weight drift from float
    summation order; accuracy 95.6%/95.4% on balanced classes (a
    degenerate always-majority model is rejected by the pytest gate)."""
    from sick_ray.stages.classify import train_logreg_quality

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scored, _w = train_logreg_quality(docs)
    return scored


SQL_QUALITY_CLASSIFIER = """
WITH RECURSIVE
tokc AS (
  SELECT doc_id, t, count(*) AS c
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+')) AS t
        FROM documents)
  GROUP BY doc_id, t
),
cnt AS (
  SELECT doc_id, sum(c) AS n_tok, count(*) AS n_dist, max(c) AS top
  FROM tokc GROUP BY doc_id
),
feats AS (
  SELECT d.doc_id,
         1.0 AS x0,
         coalesce(c.n_tok, 0) / 100.0 AS x1,
         CASE WHEN coalesce(c.n_tok, 0) > 0
              THEN CAST(c.n_dist AS DOUBLE) / c.n_tok ELSE 0.0 END AS x2,
         CASE WHEN coalesce(c.n_tok, 0) > 0
              THEN CAST(c.top AS DOUBLE) / c.n_tok ELSE 0.0 END AS x3,
         CASE WHEN coalesce(c.n_dist, 0) * 2 >= coalesce(c.n_tok, 0)
              THEN 1.0 ELSE 0.0 END AS y
  FROM documents d LEFT JOIN cnt c USING (doc_id)
),
-- anchor MUST cast to DOUBLE: the recursive CTE takes its column types
-- from the anchor row, and a bare 0.0 literal is DECIMAL(2,1) — which
-- silently rounds every weight to one decimal per iteration
it(i, w0, w1, w2, w3) AS (
  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
  UNION ALL
  SELECT i + 1,
         w0 - 2.0 * g0 / n, w1 - 2.0 * g1 / n,
         w2 - 2.0 * g2 / n, w3 - 2.0 * g3 / n
  FROM (
    SELECT i, w0, w1, w2, w3, count(*) AS n,
           sum((1/(1+exp(-(w0*x0+w1*x1+w2*x2+w3*x3))) - y) * x0) AS g0,
           sum((1/(1+exp(-(w0*x0+w1*x1+w2*x2+w3*x3))) - y) * x1) AS g1,
           sum((1/(1+exp(-(w0*x0+w1*x1+w2*x2+w3*x3))) - y) * x2) AS g2,
           sum((1/(1+exp(-(w0*x0+w1*x1+w2*x2+w3*x3))) - y) * x3) AS g3
    FROM feats, it WHERE i < 25
    GROUP BY i, w0, w1, w2, w3
  )
)
SELECT f.doc_id, CAST(y AS BIGINT) AS label,
       CAST(CASE WHEN w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 >= 0
                 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM feats f, (SELECT * FROM it WHERE i = 25) w
"""


def q_tfidf_top_terms(sf_dir: str, k: int = 3):
    """Per-document keyword extraction: top-``k`` terms by tf/df (tf-idf
    with the constant corpus-size factor dropped — monotone-equivalent
    ranking), scored as the EXACT integer ``(tf * 1e9) // df`` so the
    oracle comparison has no float drift, ties broken by term ascending.

    Ray shape (100 TB): per-batch (doc, term) distinct rows with local tf
    (narrow: hash + two ints + the short term string), ONE shuffle keyed
    by term hash whose reduce annotates each row with the term's global
    df (group size — rows are per-(doc, term) distinct), then a second
    shuffle keyed by doc_id whose reduce takes the per-doc top-k with the
    final tie-break applied locally. The classic two-exchange tf-idf; no
    driver state, no global sort."""
    from sick_ray.functions.curate import slice_token_strings
    from sick_ray.stages.minhash import tokenize_hashes_col

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tf_rows(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        th, offs, t_start, t_end, low = tokenize_hashes_col(
            col, return_spans=True
        )
        h = th.view(np.int64)
        tdoc = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                         np.diff(offs))
        order = np.lexsort((h, tdoc))
        hs, ds = h[order], tdoc[order]
        fm = first_mask(hs) | first_mask(ds)
        starts = np.flatnonzero(fm)
        tf = np.diff(np.append(starts, len(hs)))
        rep_idx = order[starts]
        if t_start is not None:
            terms = slice_token_strings(low, t_start[rep_idx], t_end[rep_idx])
        else:
            import re as _re

            toks = []
            for t in col.to_pylist():
                toks.extend(_re.findall(r"[^\W_]+", (t or "").lower()))
            terms = pa.array(np.asarray(toks, dtype=object)[rep_idx],
                             type=pa.large_string())
        return pa.table(
            {
                "h": pa.array(hs[starts], type=pa.int64()),
                "did": pa.array(did[ds[starts]], type=pa.int64()),
                "tf": pa.array(tf, type=pa.int64()),
                "term": terms,
            }
        )

    def add_df(part: pa.Table) -> pa.Table:
        h = part.column("h").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        fm = first_mask(hs)
        starts = np.flatnonzero(fm)
        gsz = np.diff(np.append(starts, len(hs)))
        df = np.empty(len(hs), dtype=np.int64)
        df[order] = np.repeat(gsz, gsz)
        return part.append_column("df", pa.array(df, type=pa.int64()))

    def topk_per_doc(part: pa.Table) -> pa.Table:
        did = part.column("did").to_numpy(zero_copy_only=False)
        tf = part.column("tf").to_numpy(zero_copy_only=False)
        df = part.column("df").to_numpy(zero_copy_only=False)
        term = np.asarray(part.column("term").to_pylist(), dtype=object)
        score = (tf * 1_000_000_000) // df
        order = np.lexsort((term, -score, did))
        d_s = did[order]
        fm = first_mask(d_s)
        starts = np.flatnonzero(fm)
        pos = np.arange(len(d_s)) - np.repeat(starts, np.diff(
            np.append(starts, len(d_s))
        ))
        top = pos < k
        sel = order[top]
        return pa.table(
            {
                "doc_id": pa.array(did[sel], type=pa.int64()),
                "term": pa.array(term[sel], type=pa.string()),
                "score": pa.array(score[sel], type=pa.int64()),
                "rk": pa.array(pos[top] + 1, type=pa.int64()),
            }
        )

    # STAGED sorts: never chain two sort shuffles in one streaming
    # execution (round-3 measurement: fused 184 s vs staged 64 s at
    # 400k docs / 8 cpus; see ROUND2/3 notes and duplicate_spans)
    with_df = grouped_apply(
        docs.map_batches(tf_rows, batch_format="pyarrow"),
        ["h"], add_df, num_partitions=QCFG.num_partitions,
    ).materialize()
    return grouped_apply(
        with_df, ["did"], topk_per_doc, num_partitions=QCFG.num_partitions
    )


def q_curated_corpus(sf_dir: str, chunk: int = 16):
    """END-TO-END curation composition — the pipeline a training-data
    user actually runs, as ONE streaming Dataset chain:

        Gopher repetition filter (on the original text)
        → PII augment + redact (the corpus has no organic PII, so both
          sides append the deterministic doc_id-derived email/phone
          before masking — redacted tails collapse back to identical
          strings, so exact-dup docs stay exact dups)
        → chunk-level exact dedup over the REDACTED text.

    Every stage is individually oracled; this query chains the SAME
    exact CTEs in SQL, so the composition is oracle-checked end-to-end
    (byte-exact reassembled text). Output: (doc_id, n_chunks, n_kept,
    text_kept) for gopher-surviving docs."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return _curated_chain(docs, chunk)


def _curated_chain(docs, chunk: int = 16):
    """The shared Gopher → PII-augment/redact → chunk-dedup chain over a
    (doc_id, text) Dataset — the back half of curated_corpus,
    curated_packed and url_deduped_curated."""
    from sick_ray.functions.curate import (
        add_repetition_stats,
        chunk_dedup,
        redact_pii,
    )

    def gopher_filter(batch: pa.Table) -> pa.Table:
        stats = add_repetition_stats(batch)      # row-aligned with batch
        keep = pc.equal(stats.column("gopher_keep"), 1)
        return batch.filter(keep)

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        ids_s = pc.cast(ids, pa.string())
        tail = pc.utf8_lpad(
            pc.cast(pc.subtract(ids, pc.multiply(pc.divide(ids, 10000), 10000)),
                    pa.string()),
            4, "0",
        )
        aug = pc.binary_join_element_wise(
            batch.column("text"), " contact user", ids_s,
            "@example.com or call 555-", tail, " now", "",
        )
        return pa.table({"doc_id": ids, "aug": aug})

    def to_text(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": batch.column("redacted")})

    curated = (
        docs.map_batches(gopher_filter, batch_format="pyarrow")
        .map_batches(augment, batch_format="pyarrow")
        .map_batches(lambda b: redact_pii(b, text_col="aug"),
                     batch_format="pyarrow")
        .map_batches(to_text, batch_format="pyarrow")
    )
    return chunk_dedup(curated, chunk=chunk,
                       num_partitions=QCFG.num_partitions)


SQL_CURATED_CORPUS = """
WITH t0 AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z]+') AS l
  FROM documents
),
tok0 AS (SELECT doc_id, unnest(l) AS tok FROM t0),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok0 GROUP BY doc_id, tok),
tstats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(max(c) AS BIGINT) AS top_token_n
  FROM cnt GROUP BY doc_id
),
ge AS (
  SELECT doc_id,
         unnest([array_to_string(l[i:i+4], ' ')
                 for i in generate_series(1, greatest(len(l) - 4, 0))]) AS g
  FROM t0
),
gstats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_5grams,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_5grams
  FROM ge GROUP BY doc_id
),
gk AS (
  SELECT d.doc_id FROM documents d
  LEFT JOIN tstats USING (doc_id) LEFT JOIN gstats USING (doc_id)
  WHERE floor(coalesce(tstats.top_token_n, 0) * 1000000.0
              / greatest(coalesce(tstats.n_tokens, 0), 1)) <= 200000
    AND floor((coalesce(gstats.n_5grams, 0)
               - coalesce(gstats.n_distinct_5grams, 0)) * 1000000.0
              / greatest(coalesce(gstats.n_5grams, 0), 1)) <= 300000
),
red AS (
  SELECT d.doc_id,
         regexp_replace(regexp_replace(
           d.text || ' contact user' || CAST(d.doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || lpad(CAST(d.doc_id % 10000 AS VARCHAR), 4, '0') || ' now',
           '[0-9A-Za-z._%+\\-]+@[0-9A-Za-z.\\-]+\\.[A-Za-z]{2,}',
           '<EMAIL>', 'g'),
           '\\b[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g') AS text
  FROM documents d JOIN gk USING (doc_id)
),
tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+') AS t
  FROM red
), ch AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+15], ' ')
                 for i in generate_series(1, len(t), 16)]) AS chunk,
         unnest([(i - 1) // 16 for i in generate_series(1, len(t), 16)]) AS idx
  FROM tok WHERE len(t) > 0
), keep AS (
  SELECT doc_id, idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) = 1 AS kept
  FROM ch
), agg AS (
  SELECT doc_id, count(*) AS n_chunks,
         count(*) FILTER (WHERE kept) AS n_kept,
         coalesce(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE kept),
                  '') AS text_kept
  FROM keep GROUP BY doc_id
)
SELECT r.doc_id, coalesce(a.n_chunks, 0) AS n_chunks,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.text_kept, '') AS text_kept
FROM red r LEFT JOIN agg a USING (doc_id)
"""


def q_url_deduped_curated(sf_dir: str, chunk: int = 16):
    """Composition #3 — the RefinedWeb ORDER of operations: URL-level
    dedup FIRST (canonicalize, keep min doc_id per canonical url — drops
    2/3 of this corpus's doc_ids), THEN the full curation chain (Gopher
    → PII redact → chunk dedup) over the survivors only. The kept-id set
    is narrow int64s broadcast in-cluster (assemble_blocks +
    searchsorted — never a text shuffle); the curated back half is the
    byte-oracled shared chain. Oracle = SQL_URL_DEDUP's CTEs feeding
    SQL_CURATED_CORPUS's CTEs (string-composed so both queries provably
    run the identical stages)."""
    import ray

    from sick_ray.shuffle import assemble_blocks

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    kept = grouped_apply(
        docs.select_columns(["doc_id"]).map_batches(
            _add_synth_canon_urls, batch_format="pyarrow"),
        ["canon_url"], _url_group_kernel,
        num_partitions=QCFG.num_partitions, partial=_url_group_kernel,
    ).materialize()

    def finalize_ids(tbl: pa.Table) -> np.ndarray:
        return np.unique(tbl.column("doc_id").to_numpy(zero_copy_only=False))

    ids_ref = assemble_blocks(kept, ["doc_id"], finalize_ids,
                              empty=np.empty(0, dtype=np.int64))

    def keep_only(batch: pa.Table) -> pa.Table:
        keep_ids = ray.get(ids_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(keep_ids) == 0:
            return batch.slice(0, 0)
        pos = np.minimum(np.searchsorted(keep_ids, ids), len(keep_ids) - 1)
        return batch.filter(pa.array(keep_ids[pos] == ids))

    survivors = docs.map_batches(keep_only, batch_format="pyarrow")
    return _curated_chain(survivors, chunk)


def q_curated_packed(sf_dir: str):
    """The FULL training-data pipeline as one composition: curation
    (Gopher filter → PII redact → chunk dedup, q_curated_corpus's exact
    chain) → deterministic 80% hash sample over the SURVIVING docs →
    GPT-style sequence packing of the DEDUPED text (token budget 2048,
    +1 EOS per doc, doc_id-hash shards). Oracle = the same chained CTEs:
    SQL_CURATED_CORPUS verbatim as a subquery, the HUGEINT-safe sample
    predicate, and the window-cumsum pack twin — so the whole pipeline
    is oracle-checked end-to-end, not just its stages. Output one row
    per packed doc: (doc_id, shard, tok, seq_start, seq_end,
    seq_offset), all exact integers."""
    from sick_ray.functions.curate import weighted_sample_mask
    from sick_ray.stages.minhash import tokenize_hashes_col

    curated = q_curated_corpus(sf_dir)

    def sample_count_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = weighted_sample_mask(ids, np.full(len(ids), 800, dtype=np.int64))
        b = batch.filter(pa.array(m))
        ids_k = b.column("doc_id").to_numpy(zero_copy_only=False)
        col = b.column("text_kept")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, offs = tokenize_hashes_col(col)
        return pa.table({
            "doc_id": pa.array(ids_k, type=pa.int64()),
            "shard": pa.array(ids_k % N_PACK_SHARDS, type=pa.int64()),
            "tok": pa.array(np.diff(offs) + 1, type=pa.int64()),  # +EOS
        })

    slim = curated.map_batches(sample_count_shard, batch_format="pyarrow")

    def pack(group: pa.Table) -> pa.Table:
        g = group.take(pc.sort_indices(group, sort_keys=[("doc_id", "ascending")]))
        tok = g.column("tok").to_numpy(zero_copy_only=False)
        start = np.cumsum(tok) - tok
        return pa.table({
            "doc_id": g.column("doc_id"),
            "shard": g.column("shard"),
            "tok": g.column("tok"),
            "seq_start": pa.array(start // PACK_BUDGET, pa.int64()),
            "seq_end": pa.array((start + tok - 1) // PACK_BUDGET, pa.int64()),
            "seq_offset": pa.array(start % PACK_BUDGET, pa.int64()),
        })

    return slim.groupby("shard").map_groups(pack, batch_format="pyarrow")


SQL_CURATED_PACKED = "WITH cur AS (" + SQL_CURATED_CORPUS + """),
samp AS (
  SELECT doc_id, text_kept FROM cur
  WHERE ((doc_id::HUGEINT * 2654435761) % 4294967296) % 1000 < 800
),
t AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_extract_all(text_kept, '[0-9a-z]+')) AS BIGINT)
           + 1 AS tok
  FROM samp
),
c AS (
  SELECT doc_id, shard, tok,
         SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - tok AS start_pos
  FROM t
)
SELECT doc_id, shard, tok,
       CAST(start_pos // 2048 AS BIGINT) AS seq_start,
       CAST((start_pos + tok - 1) // 2048 AS BIGINT) AS seq_end,
       CAST(start_pos % 2048 AS BIGINT) AS seq_offset
FROM c
"""


def q_events_distinct_users(sf_dir: str):
    """EXACT per-event-type distinct-user counts — the shuffle-heavy twin
    the HLL sketch (q_events_user_hll) avoids: per-batch distinct
    (event_type, user_id) pairs ride one hash shuffle, the reduce
    double-distincts and emits per-type partial counts, and the driver
    folds a handful of rows."""
    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def pair_rows(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        code = pc.index_in(et, pc.unique(et)).to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, code))
        # two-array boundary compare — a packed code*K+uid key collides
        # for |uid| ≥ K (64-bit / negative ids) and int32*py-int promotion
        # raises under numpy ≥ 2
        c_s, u_s = code[order], uid[order]
        fm = np.ones(len(c_s), dtype=bool)
        if len(c_s) > 1:
            fm[1:] = (c_s[1:] != c_s[:-1]) | (u_s[1:] != u_s[:-1])
        keep = order[fm]
        return pa.table({
            "event_type": et.take(pa.array(keep)),
            "user_id": pa.array(uid[keep], type=pa.int64()),
        })

    def count_partition(part: pa.Table) -> pa.Table:
        et = np.asarray(part.column("event_type").to_pylist(), dtype=object)
        uid = part.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, et))
        et_s, uid_s = et[order], uid[order]
        fm = np.ones(len(et_s), dtype=bool)
        if len(et_s) > 1:
            fm[1:] = (et_s[1:] != et_s[:-1]) | (uid_s[1:] != uid_s[:-1])
        et_d = et_s[fm]
        tfm = np.ones(len(et_d), dtype=bool)
        if len(et_d) > 1:
            tfm[1:] = et_d[1:] != et_d[:-1]
        starts = np.flatnonzero(tfm)
        cnt = np.diff(np.append(starts, len(et_d)))
        return pa.table({
            "event_type": pa.array(et_d[tfm], type=pa.string()),
            "n_users": pa.array(cnt, type=pa.int64()),
        })

    parts = grouped_apply(
        ev.map_batches(pair_rows, batch_format="pyarrow"),
        ["event_type", "user_id"], count_partition,
        num_partitions=QCFG.num_partitions,
    ).to_pandas()
    g = parts.groupby("event_type", as_index=False)["n_users"].sum()
    return pa.Table.from_pandas(g.sort_values("event_type"),
                                preserve_index=False)


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# Golden conformance tables for the two deterministic sketch surfaces
# (scripts/make_sketch_golden.py — independent scalar second
# implementations; the script ASSERTS scalar == engine at every scale
# before writing). One file holds all scales, keyed by an `sf` column;
# the static oracle pins sf0.01 (the driver's correctness scale) and
# tests/test_ops.py asserts the sf0.1 rows.
SKETCH_HLL_GOLDEN = "/root/repo/tests/golden/sketch_hll_golden.parquet"
SKETCH_PQ_GOLDEN = "/root/repo/tests/golden/sketch_pq_golden.parquet"


def sketch_golden_sql(path: str, cols: str, sf_dir: str) -> str:
    """Golden-oracle SQL selecting ``sf_dir``'s scale's rows. Sketch
    outputs are corpus-dependent, so comparing another scale's output
    against the wrong rows would report a spurious mismatch — the golden
    file carries one row-set per generated scale."""
    import os as _os

    key = _os.path.basename(_os.path.normpath(sf_dir))
    return f"SELECT {cols} FROM read_parquet('{path}') WHERE sf = '{key}'"


SQL_EVENTS_USER_HLL = sketch_golden_sql(
    SKETCH_HLL_GOLDEN, "event_type, approx_users", "/root/testdata/sf0.01")
SQL_PRICE_QUANTILES_SKETCH = sketch_golden_sql(
    SKETCH_PQ_GOLDEN, "l_returnflag, p25, p50, p75, p95",
    "/root/testdata/sf0.01")


def q_events_user_hll(sf_dir: str, p: int = 14):
    """APPROXIMATE per-event-type distinct users via HyperLogLog — the
    100-TB path: user ids NEVER shuffle; each batch emits one 2^p-byte
    register array per event type, merged by elementwise max. Standard
    error 1.04/sqrt(2^p) ≈ 0.8% at p=14. The register matrix (and hence
    the estimate) is a DETERMINISTIC function of the input — max-merge
    commutes across any batching — so it is oracled GOLDEN-style against
    an independent scalar second implementation
    (scripts/make_sketch_golden.py: python-int splitmix64 + bit_length
    clz + math.fsum estimator vs the engine's vectorized numpy); pytest
    additionally gates the estimate against the exact twin
    q_events_distinct_users' error envelope."""
    from sick_ray.functions.sketch import hll_batch_registers, hll_merge_estimate

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        uniq = pc.unique(et)
        code = pc.index_in(et, uniq).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        regs = hll_batch_registers(code.astype(np.int64), len(uniq),
                                   uid.astype(np.uint64), p)
        return pa.table({
            "event_type": uniq,
            "regs": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(m), len(uniq), [None, pa.py_buffer(regs)]
            ),
        })

    def merge(part: pa.Table) -> pa.Table:
        et = np.asarray(part.column("event_type").to_pylist(), dtype=object)
        raw = part.column("regs").combine_chunks()
        mat = np.frombuffer(raw.buffers()[1], dtype=np.uint8,
                            count=len(et) * m).reshape(len(et), m)
        order = np.argsort(et, kind="stable")
        et_s = et[order]
        fm = np.ones(len(et_s), dtype=bool)
        if len(et_s) > 1:
            fm[1:] = et_s[1:] != et_s[:-1]
        starts = np.flatnonzero(fm)
        out_et, out_n = [], []
        for i, s0 in enumerate(starts):
            s1 = starts[i + 1] if i + 1 < len(starts) else len(et_s)
            merged = np.maximum.reduce(mat[order[s0:s1]])
            out_et.append(et_s[s0])
            out_n.append(hll_merge_estimate(merged))
        return pa.table({
            "event_type": pa.array(out_et, type=pa.string()),
            "approx_users": pa.array(out_n, type=pa.int64()),
        })

    return grouped_apply(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], merge, num_partitions=QCFG.num_partitions,
    )


def q_top_terms_mg(sf_dir: str, cap: int = 4096):
    """APPROXIMATE corpus top-20 terms via mergeable Misra-Gries
    summaries — the 100-TB path: each batch's exact counts compress to
    ≤ ``cap`` counters (subtract the (cap+1)-th largest, drop ≤0), so
    the shuffle carries at most cap rows per batch no matter how large
    the batch vocabulary is. Summed counters under-count any term by at
    most N_tokens/(cap+1); every term with true count above that bound
    is guaranteed present. VALIDITY DOMAIN of the shared oracle: when
    the TOTAL corpus vocabulary is ≤ cap, no batch can ever trigger the
    MG compression regardless of batch boundaries, so the sketch output
    provably EQUALS the exact top-20 — the synthetic corpus has 31
    distinct terms vs cap=4096 at every scale, so this query shares
    SQL_TOP_TERMS (the knn_lsh/knn_ivf recoverable-regime discipline).
    The compression regime itself is pytest-gated with a small cap
    against the N/(cap+1) bound (tests/test_ops.py)."""
    return _top_terms_impl(sf_dir, cap=cap)


def q_kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5):
    """Full-corpus distributed k-means (spherical Lloyd) over the
    embeddings table: per iteration centroids broadcast once, one
    streaming assignment+partial-sum pass, O(k·d) driver fold — the
    iterative-refinement pattern (train_centroids' sample-bounded twin
    that sees EVERY vector). The fixpoint's CENTROIDS depend on float
    summation order across blocks, but the integer ASSIGNMENTS are
    stable far from cluster boundaries — so the oracle compares
    assignments only, against a 5-iteration recursive-CTE Lloyd in
    DuckDB (same init: k lowest vec_ids; same spherical update; same
    lowest-cluster tie-break). Verified assignment-identical at
    sf0.001/0.01/0.1; a corpus with points within float noise of a
    boundary would need a rows-only fallback. pytest additionally gates
    against a single-process numpy Lloyd (centroids allclose)."""
    from sick_ray.stages.ann import kmeans_lloyd

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assignments, _cent = kmeans_lloyd(emb, k=k, iters=iters)
    return assignments


def q_semdedup_embeddings(sf_dir: str, k: int = 8, iters: int = 5,
                          tau: float = 0.3):
    """SemDeDup (Abbas et al. 2023) semantic dedup: k-means cluster the
    embeddings (same distributed Lloyd as kmeans_embeddings), then drop
    every vector whose cosine to ANY lower-vec_id member of its cluster
    is >= tau — the deterministic keep-lowest-id variant, so the whole
    decision is SQL-expressible: the oracle reuses the kmeans
    recursive-CTE assignments verbatim and applies the identical
    NOT-EXISTS prune. VALIDITY DOMAIN: both the assignment oracle's
    boundary-stability argument AND a cosine-threshold margin apply —
    measured min |cos - tau| is 6.9e-05 at sf0.01 (all pairs) and
    1.5e-06 at sf0.1 (within clusters); the engine/oracle both sum in
    float64 (drift ~1e-15), so no keep-flag can flip. Verified
    row-identical at both scales. Within-cluster work is row-chunked;
    at 10^12 docs k scales with n (paper: ~100k clusters) so
    per-cluster cost stays bounded."""
    from sick_ray.stages.ann import semdedup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup(emb, k=k, iters=iters, tau=tau,
                    num_partitions=QCFG.num_partitions)


# Shared recursive-CTE Lloyd (5 iterations) producing final_assign
# (vec_id, cluster) — the oracle half of both kmeans_embeddings and
# semdedup_embeddings. Kept as a prefix string so the two oracles are
# guaranteed to run the IDENTICAL clustering.
_SQL_KMEANS_ASSIGN_CTE = """
WITH RECURSIVE
pts AS (  -- unit-normalized points, long format
  SELECT vec_id, i - 1 AS dim,
         CAST(embedding[i] AS DOUBLE)
           / greatest(sqrt((SELECT sum(CAST(e2.x AS DOUBLE) * CAST(e2.x AS DOUBLE))
                            FROM unnest(embedding) AS e2(x))), 1e-12) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
),
init AS (  -- k lowest vec_ids as initial centroids
  SELECT dense_rank() OVER (ORDER BY vec_id) - 1 AS c, dim, v AS cv
  FROM pts
  WHERE vec_id IN (SELECT DISTINCT vec_id FROM pts ORDER BY vec_id LIMIT 8)
),
iter(it, c, dim, cv) AS (
  SELECT 0, c, dim, cv FROM init
  UNION ALL
  SELECT it + 1, c, dim, cv FROM (
    WITH cur AS (SELECT * FROM iter WHERE it < 5),
    dots AS (
      SELECT cur.it, p.vec_id, cur.c, sum(p.v * cur.cv) AS dot
      FROM pts p JOIN cur ON p.dim = cur.dim
      GROUP BY 1, 2, 3
    ),
    assign AS (
      SELECT it, vec_id, c FROM (
        SELECT it, vec_id, c,
               row_number() OVER (PARTITION BY it, vec_id
                                  ORDER BY dot DESC, c ASC) AS rk
        FROM dots
      ) WHERE rk = 1
    ),
    sums AS (
      SELECT a.it, a.c, p.dim, sum(p.v) AS s
      FROM assign a JOIN pts p USING (vec_id)
      GROUP BY 1, 2, 3
    ),
    norms AS (
      SELECT it, c, sqrt(sum(s * s)) AS nrm FROM sums GROUP BY 1, 2
    ),
    newc AS (
      SELECT s.it, s.c, s.dim,
             CASE WHEN n.nrm > 0 THEN s.s / n.nrm ELSE NULL END AS cv
      FROM sums s JOIN norms n USING (it, c)
    )
    -- empty clusters keep the previous centroid
    SELECT cur.it, cur.c, cur.dim, coalesce(newc.cv, cur.cv) AS cv
    FROM cur LEFT JOIN newc ON newc.it = cur.it AND newc.c = cur.c
                            AND newc.dim = cur.dim
  )
),
final_c AS (SELECT c, dim, cv FROM iter WHERE it = 5),
final_dots AS (
  SELECT p.vec_id, f.c, sum(p.v * f.cv) AS dot
  FROM pts p JOIN final_c f ON p.dim = f.dim
  GROUP BY 1, 2
),
final_assign AS (
  SELECT vec_id, c AS cluster FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c ASC) AS rk
    FROM final_dots
  ) WHERE rk = 1
)
"""

SQL_KMEANS_EMBEDDINGS = _SQL_KMEANS_ASSIGN_CTE + """
SELECT vec_id, cluster FROM final_assign
"""

SQL_SEMDEDUP_EMBEDDINGS = _SQL_KMEANS_ASSIGN_CTE + """,
sims AS (
  SELECT a.vec_id AS hi, sum(p1.v * p2.v) AS cs
  FROM final_assign a
  JOIN final_assign b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
  JOIN pts p1 ON p1.vec_id = a.vec_id
  JOIN pts p2 ON p2.vec_id = b.vec_id AND p2.dim = p1.dim
  GROUP BY a.vec_id, b.vec_id
)
SELECT f.vec_id, f.cluster,
       f.vec_id NOT IN (SELECT hi FROM sims WHERE cs >= 0.3) AS keep
FROM final_assign f
"""


SQL_TFIDF_TOP_TERMS = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text,'')), '[0-9a-z]+'))
           AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT t.doc_id, t.term, (t.tf * 1000000000) // d.df AS score,
         row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY (t.tf * 1000000000) // d.df DESC, t.term
         ) AS rk
  FROM tf t JOIN df d USING (term)
)
SELECT doc_id, term, score, rk FROM scored WHERE rk <= 3
"""


def _url_group_kernel(part: pa.Table) -> pa.Table:
    """Group (doc_id, canon_url, n_dups) rows by canon_url hash: keep the
    min-doc_id representative, sum partial counts. Used as BOTH the
    map-side partial (per batch — raw urls for one page are usually
    block-adjacent, so most 3→1 collapses happen before the shuffle) and
    the reduce-side combine; 64-bit url-hash collision risk ~n²/2⁶⁴,
    same documented bound as novelty_docs."""
    cu = part.column("canon_url")
    if isinstance(cu, pa.ChunkedArray):
        cu = cu.combine_chunks()
    h = xxh64_strings(cu).view(np.int64)
    did = part.column("doc_id").to_numpy(zero_copy_only=False)
    w = part.column("n_dups").to_numpy(zero_copy_only=False)
    order = sort_index(h, did)
    fm = first_mask(h[order])
    starts = np.flatnonzero(fm)
    cnt = np.add.reduceat(w[order], starts)
    firsts = order[fm]
    return pa.table(
        {
            "doc_id": pa.array(did[firsts], type=pa.int64()),
            "canon_url": pc.take(cu, pa.array(firsts)),
            "n_dups": pa.array(cnt.astype(np.int64), type=pa.int64()),
        }
    )


def _add_synth_canon_urls(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    raw = synth_urls(ids)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "canon_url": canonicalize_urls(raw),
            "n_dups": pa.array(np.ones(len(ids), dtype=np.int64)),
        }
    )


def q_url_dedup_docs(sf_dir: str):
    """URL-level dedup after canonicalization — the first dedup pass of a
    CCNet/RefinedWeb-style pipeline: strip fragments/tracking params,
    case-fold the authority, then keep one doc per canonical url (min
    doc_id) with the duplicate count. The documents table carries no url
    column, so both sides derive the SAME raw url deterministically from
    doc_id (3 variants per page exercising every canonicalization rule —
    the pii_redact_docs augmentation precedent; functions/urlnorm.py).
    Shuffle rows are (hash-partitioned) post-partial survivors only; text
    is never read."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    with_u = docs.map_batches(_add_synth_canon_urls, batch_format="pyarrow")
    out = grouped_apply(
        with_u, ["canon_url"], _url_group_kernel,
        num_partitions=QCFG.num_partitions, partial=_url_group_kernel,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["kept_doc_id", "canon_url", "n_dups"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_URL_DEDUP_DOCS = r"""
WITH raw AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'https://site' || ((doc_id // 3) % 50)
                       || '.example.com/p/' || (doc_id // 3)
                       || '?id=' || (doc_id // 3)
           WHEN 1 THEN 'https://site' || ((doc_id // 3) % 50)
                       || '.example.com/p/' || (doc_id // 3)
                       || '?utm_source=feed&id=' || (doc_id // 3) || '&ref=rss'
           ELSE 'HTTPS://SITE' || ((doc_id // 3) % 50)
                || '.Example.COM/p/' || (doc_id // 3)
                || '/?id=' || (doc_id // 3) || '#frag'
         END AS u
  FROM documents
),
c AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(u,
        '#.*$', '', 'g'),
        '([?&])((utm_[a-z0-9]+|ref|fbclid|gclid)=[^&#]*(&|$))+', '\1', 'g'),
        '[?&]+$', '', 'g'),
        '/+\?', '?', 'g'),
        '/+$', '', 'g') AS u6
  FROM raw
),
canon AS (
  SELECT doc_id,
    CASE WHEN regexp_matches(u6, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*')
      THEN lower(regexp_extract(u6, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1))
           || regexp_extract(u6, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)$', 1)
      ELSE u6 END AS canon_url
  FROM c
)
SELECT canon_url, min(doc_id) AS kept_doc_id,
       count(*) AS n_dups
FROM canon GROUP BY canon_url
"""


# Composition #3 oracle: url-dedup CTEs → kept ids → the curated chain
# with its `documents` reads redirected to the deduped CTE. Composed
# from the two oracles so all three queries provably share their SQL.
_URL_CTES = SQL_URL_DEDUP_DOCS[: SQL_URL_DEDUP_DOCS.index("\nSELECT canon_url")]
assert SQL_CURATED_CORPUS.count("FROM documents") == 3
SQL_URL_DEDUPED_CURATED = (
    _URL_CTES
    + """,
kept AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY canon_url),
dd AS (SELECT d.doc_id, d.text FROM documents d JOIN kept USING (doc_id))"""
    + SQL_CURATED_CORPUS.replace("WITH t0 AS", ", t0 AS")
                        .replace("FROM documents", "FROM dd")
)


SNAPSHOT_PREFIX_CHARS = 64


def _snapshot_fp(text_col) -> np.ndarray:
    """Cheap snapshot content key: xxh64 of the first 64 chars — the
    prefix-fingerprint first pass of crawl dedup (full-text fp is the
    same code with the slice removed; the prefix variant is what actually
    fires on this corpus and what big crawls run before the exact pass)."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    pref = pc.utf8_slice_codeunits(text_col, 0, SNAPSHOT_PREFIX_CHARS)
    return xxh64_strings(pref).view(np.int64)


def _old_snapshot_fps(batch: pa.Table) -> pa.Table:
    """Distinct prefix fingerprints of the OLD snapshot half (even ids)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    b = batch.filter(pa.array(ids % 2 == 0))
    fp = _snapshot_fp(b.column("text"))
    return pa.table({"fp64": pa.array(np.unique(fp), type=pa.int64())})


def q_snapshot_dedup_docs(sf_dir: str):
    """Incremental cross-snapshot dedup — the Common-Crawl monthly-update
    shape: docs with even doc_id stand in for the already-ingested
    snapshot, odd doc_ids for the new crawl; keep only new docs whose
    content key (xxh64 of the first 64 chars — the prefix-fingerprint
    first pass; see _snapshot_fp) is absent from the old snapshot. The
    old side reduces to distinct uint64 fingerprints assembled in-cluster
    into one broadcast probe array (decontaminate_docs pattern — zero
    driver traffic); new docs probe per batch with searchsorted. At
    10^12-doc scale the old-fp set exceeds BROADCAST_KEYS_LIMIT and this
    becomes shuffle.semi_select's Bloom-prefiltered anti join (same fp64
    key column on both sides); the broadcast path is the ≤2M-snapshot
    fast path. 64-bit fp collision risk ~n²/2⁶⁴ (novelty_docs bound)."""
    import ray

    from sick_ray.shuffle import assemble_blocks, unique_fp64

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source", "n_chars"])
    old_fps = docs.map_batches(
        _old_snapshot_fps, batch_format="pyarrow"
    ).materialize()
    fp_ref = assemble_blocks(
        old_fps, ["fp64"], unique_fp64,
        empty=np.empty(0, dtype=np.int64),
    )

    def keep_novel(batch: pa.Table) -> pa.Table:
        old = ray.get(fp_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array(ids % 2 == 1))
        if b.num_rows == 0:
            return b.select(["doc_id", "lang", "source", "n_chars"])
        fp = _snapshot_fp(b.column("text"))
        if len(old):
            pos = np.clip(np.searchsorted(old, fp), 0, len(old) - 1)
            novel = old[pos] != fp
        else:
            novel = np.ones(len(fp), dtype=bool)
        return b.filter(pa.array(novel)).select(
            ["doc_id", "lang", "source", "n_chars"])

    return docs.map_batches(keep_novel, batch_format="pyarrow")


SQL_SNAPSHOT_DEDUP_DOCS = """
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM documents o
    WHERE o.doc_id % 2 = 0
      AND substr(o.text, 1, 64) = substr(d.text, 1, 64)
  )
"""


N_TRAIN_SHARDS = 16


def _add_shard_key(batch: pa.Table) -> pa.Table:
    """Knuth multiplicative hash → (shard_id, order key h). The hash is
    bijective mod 2^32 (K odd), so h is collision-free for doc_id < 2^32
    and the (h, doc_id) order is a deterministic pseudo-random permutation."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "shard_id": pa.array((h % np.uint64(N_TRAIN_SHARDS)).astype(np.int64)),
            "h": pa.array(h.astype(np.int64)),
        }
    )


def _rank_within_shards(part: pa.Table) -> pa.Table:
    shard = part.column("shard_id").to_numpy(zero_copy_only=False)
    h = part.column("h").to_numpy(zero_copy_only=False)
    did = part.column("doc_id").to_numpy(zero_copy_only=False)
    order = sort_index(shard, h, did)
    ss = shard[order]
    starts = np.flatnonzero(first_mask(ss))
    pos = np.arange(len(ss), dtype=np.int64)
    pos -= np.repeat(starts, np.diff(np.append(starts, len(ss))))
    return pa.table(
        {
            "doc_id": pa.array(did[order], type=pa.int64()),
            "shard_id": pa.array(ss, type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
        }
    )


def q_shard_docs(sf_dir: str):
    """Deterministic global shuffle into training shards — the last step
    before writing a pretraining corpus: shard = knuth_hash(doc_id) mod
    N, position = rank of (hash, doc_id) within the shard. Reproducible
    from ids alone (reshard/rerun-invariant, like sample_docs) and free
    of any RNG state. One narrow 24 B/row shuffle (doc_id, shard, h);
    ranks are assigned per shard with a vectorized segmented enumerate.
    At 10^12 docs the shard count grows so each shard fits a reduce task
    (the pack_sequences scaling assumption)."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    keyed = docs.map_batches(_add_shard_key, batch_format="pyarrow")
    return grouped_apply(
        keyed, ["shard_id"], _rank_within_shards,
        num_partitions=N_TRAIN_SHARDS,
    )


SQL_SHARD_DOCS = """
WITH keyed AS (
  SELECT doc_id,
         ((doc_id::HUGEINT * 2654435761) % 4294967296) AS h,
         CAST(((doc_id::HUGEINT * 2654435761) % 4294967296) % 16 AS BIGINT)
           AS shard_id
  FROM documents
)
SELECT doc_id, shard_id,
       CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id) - 1
            AS BIGINT) AS pos
FROM keyed
"""


def q_snapshot_near_dup_docs(sf_dir: str):
    """Incremental NEAR-dup against a frozen index (stages/index.py): even
    doc_ids are frozen into a MinHash/LSH index (signatures + band
    buckets on disk), odd doc_ids probe it — the monthly-crawl companion
    of snapshot_dedup_docs at near-dup granularity. Returns verified
    (old_fp64, new_fp64) pairs at est Jaccard ≥ cfg.verify_threshold.

    FULLY oracled (round 4): per-doc signatures/band hashes/fp64 are
    deterministic, recomputed by an INDEPENDENT scalar implementation
    into a golden table (scripts/make_snapidx_golden.py, keyed by
    (doc_id, md5(text)) so one file serves every sf), and DuckDB replays
    the probe semantics over it — distinct-by-fp64 per side, candidate
    = any shared (band_idx, band_hash) bucket old×new, then signature
    estimate matches/128 ≥ threshold (identical float compare). The
    semantic-quality oracle (exact O(|A|×|B|) cross-half Jaccard: recall
    1.0 at J≥0.9, precision floor, partition invariance, config guards)
    lives in tests/test_index.py. Validity domain: the per-bucket pair
    cap must not truncate (counters zero at every testdata scale)."""
    import os

    from sick_ray.stages.index import build_dedup_index, probe_dedup_index

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def even(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 2 == 0))

    def odd(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 2 == 1))

    # mkdtemp for isolation (two concurrent drivers on one sf_dir must
    # not race build against probe), removed after the probe result is
    # MATERIALIZED (a lazy return would read a deleted index) — so
    # repeated bench/driver runs leak nothing
    import shutil
    import tempfile

    idx_dir = tempfile.mkdtemp(prefix="sick_ray_snapidx_")
    try:
        build_dedup_index(
            docs.map_batches(even, batch_format="pyarrow"), idx_dir, QCFG)
        pairs = probe_dedup_index(
            docs.map_batches(odd, batch_format="pyarrow"), idx_dir, QCFG)

        def finish(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(["old_fp64", "new_fp64"])

        return pairs.map_batches(finish, batch_format="pyarrow").materialize()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


MINHASH_GOLDEN = "/root/repo/tests/golden/minhash_golden.parquet"

SQL_SNAPSHOT_NEAR_DUP_DOCS = f"""
WITH d AS (
  SELECT doc_id, md5(text) AS m, CAST(doc_id % 2 AS INT) AS side FROM documents
),
g AS (SELECT * FROM read_parquet('{MINHASH_GOLDEN}')),
du AS (
  SELECT DISTINCT d.side, g.fp64, g.sig, g.bands
  FROM d JOIN g ON g.doc_id = d.doc_id AND g.text_md5 = d.m
),
bb AS (
  SELECT side, fp64, unnest(bands) AS bh, generate_subscripts(bands, 1) AS bi
  FROM du
),
cand AS (
  SELECT DISTINCT o.fp64 AS old_fp64, n.fp64 AS new_fp64
  FROM bb o JOIN bb n ON o.bi = n.bi AND o.bh = n.bh
  WHERE o.side = 0 AND n.side = 1
)
SELECT c.old_fp64, c.new_fp64
FROM cand c
JOIN (SELECT DISTINCT fp64, sig FROM du WHERE side = 0) a ON a.fp64 = c.old_fp64
JOIN (SELECT DISTINCT fp64, sig FROM du WHERE side = 1) b ON b.fp64 = c.new_fp64
WHERE len(list_filter(list_zip(a.sig, b.sig), p -> p[1] = p[2]))
      / 128.0 >= 0.72
"""


MEDIA_PHASH_GOLDEN = "/root/repo/tests/golden/media_phash_golden.parquet"


def q_media_phash_near_dup(sf_dir: str):
    """IMAGE near-dup via 56-bit perceptual dHash over REAL decoded BMP
    pixels (stages/multimodal.py::phash_near_dup): decode (actor pool) →
    integer-exact 8×8 thumbnail → dHash → 4×14-bit band LSH → inline
    hamming-≤3 verify. The banding is lossless at this threshold
    (pigeonhole), so the output is exactly the hamming-≤3 pair set and
    the oracle is a full O(n²) bit_count(xor()) self-join in DuckDB over
    a golden phash table computed by an INDEPENDENT scalar decode +
    bit-loop (scripts/make_media_golden.py::main_phash — the
    media_decode_real conformance discipline). Corrupt payloads are
    excluded on both sides."""
    import ray.data as rd

    from sick_ray.stages.multimodal import phash_near_dup, synth_media_dups

    media = rd.from_arrow(synth_media_dups(240, seed=11))
    return phash_near_dup(media, num_partitions=QCFG.num_partitions,
                          concurrency=2)


SQL_MEDIA_PHASH_NEAR_DUP = f"""
WITH g AS (
  SELECT media_id, phash FROM read_parquet('{MEDIA_PHASH_GOLDEN}')
)
SELECT a.media_id AS u, b.media_id AS v,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS dist
FROM g a JOIN g b ON b.media_id > a.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""


def q_media_frames(sf_dir: str):
    """REAL video frame sampling over the deterministic VIDB fixture
    (stages/multimodal.py::FrameSampler): parse the length-prefixed BMP
    frame container, decode k = 4 evenly spaced frames per video
    (index j·F // k) in an actor pool with small batches, and emit one
    integer-exact feature row per sampled frame (thumb_xxh = xxh64 of
    the 8×8 milli-weight thumbnail; pix_mean from the exact int sum).
    Per-row error isolation at BOTH container and frame level. Oracled
    against a golden table built by an INDEPENDENT scalar
    implementation (scripts/make_media_golden.py::main_frames:
    struct-unpacked container walk + per-pixel python thumbnail + the
    scalar xxh64 path vs the stage's vectorized batch path — the
    media_decode_real conformance discipline)."""
    import ray.data as rd

    from sick_ray.stages.multimodal import sample_frames, synth_media_video

    media = rd.from_arrow(synth_media_video(160, seed=13))
    out = sample_frames(media, n_frames=4, concurrency=2).to_pandas()
    out["failed"] = out["decode_err"].notna()
    out = out.drop(columns=["decode_err"]).sort_values(
        ["media_id", "frame"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


MEDIA_FRAMES_GOLDEN = "/root/repo/tests/golden/media_frames_golden.parquet"

SQL_MEDIA_FRAMES = f"""
SELECT media_id, frame, total_frames, thumb_xxh, pix_mean, failed
FROM read_parquet('{MEDIA_FRAMES_GOLDEN}')
"""


def _byte_stats_kernel(batch: pa.Table) -> pa.Table:
    """Per-doc byte-histogram stats, fully vectorized: one bincount over
    (doc_index * 256 + byte) for the whole batch — no per-doc loop."""
    col = batch.column("text")
    n = batch.num_rows
    buf, offs = _string_col_buffers(col)   # zero-copy, slice/large-safe
    lens = offs[1:] - offs[:-1]
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    codes = doc_idx * 256 + buf
    counts = np.bincount(codes, minlength=n * 256).reshape(n, 256)
    distinct = (counts > 0).sum(axis=1).astype(np.int64)
    top = counts.max(axis=1).astype(np.int64)
    ppm = np.zeros(n, dtype=np.int64)
    nz = lens > 0
    ppm[nz] = (top[nz] * 1_000_000) // lens[nz]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bytes": pa.array(lens, type=pa.int64()),
            "distinct_bytes": pa.array(distinct, type=pa.int64()),
            "top_byte_ppm": pa.array(ppm, type=pa.int64()),
        }
    )


def q_byte_stats_docs(sf_dir: str):
    """Byte-level quality signals — the cheap binary/garbage detector a
    crawl pipeline runs before any tokenizer: per doc, byte count,
    distinct byte values, and the top byte's frequency as an EXACT ppm
    integer (the gopher top-token trick at byte granularity; a float
    entropy would drift between numpy's pairwise and SQL's sequential
    summation, so the signal is fixed-point by design). Zero shuffle;
    one bincount per batch over the zero-copy Arrow buffer. The corpus
    is ASCII so DuckDB's char-based substr equals bytes (documented)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_byte_stats_kernel, batch_format="pyarrow")


SQL_BYTE_STATS_DOCS = """
WITH ch AS (
  SELECT doc_id, substr(text, t.i, 1) AS c
  FROM documents, unnest(generate_series(1, greatest(length(text), 0))) t(i)
),
cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS distinct_bytes,
         max(n) AS top_n
  FROM cnt GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_bytes,
       coalesce(a.distinct_bytes, 0) AS distinct_bytes,
       CAST(coalesce((a.top_n * 1000000) // length(d.text), 0) AS BIGINT)
         AS top_byte_ppm
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


WINDOW_DEDUP_US = 10 * 60 * 1_000_000   # 10 minutes


def _window_dedup_kernel(part: pa.Table) -> pa.Table:
    """Keep an event iff no SAME-(user_id, event_type) event exists in the
    preceding 10 minutes (previous-RAW-event semantic, = SQL LAG) —
    vectorized: sort by (key-hash, ts, event_id), one diff per run."""
    if part.num_rows == 0:
        return part.select(["event_id", "user_id", "event_type", "ts"])
    k = combine_keys(part, ["user_id", "event_type"]).view(np.int64)
    ts = part.column("ts").to_numpy(zero_copy_only=False).view(np.int64)
    eid = part.column("event_id").to_numpy(zero_copy_only=False)
    order = sort_index(k, ts, eid)
    ks, tss = k[order], ts[order]
    fm = first_mask(ks)
    diff = np.empty(len(tss), dtype=np.int64)
    diff[0] = WINDOW_DEDUP_US + 1
    diff[1:] = tss[1:] - tss[:-1]
    keep = fm | (diff > WINDOW_DEDUP_US)
    return part.take(pa.array(np.sort(order[keep]))).select(
        ["event_id", "user_id", "event_type", "ts"])


def q_events_window_dedup(sf_dir: str):
    """Streaming windowed dedup — the alert-suppression / repeated-event
    filter: drop an event when the same (user_id, event_type) fired
    within the previous 10 minutes. One narrow hash shuffle on the key
    (props/value never move), per-partition vectorized run-diff; the
    previous-RAW-event semantic matches SQL LAG exactly (a
    previous-KEPT-event semantic would be a sequential scan per key —
    doable with the same kernel via a per-run loop, but not
    SQL-window-expressible). Ties on ts break by event_id."""
    events = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "event_type", "ts"])
    return grouped_apply(events, ["user_id", "event_type"],
                         _window_dedup_kernel,
                         num_partitions=QCFG.num_partitions)


SQL_EVENTS_WINDOW_DEDUP = """
SELECT event_id, user_id, event_type, ts FROM (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS pts
  FROM events
) WHERE pts IS NULL OR ts - pts > INTERVAL 10 MINUTE
"""


def q_source_stats(sf_dir: str):
    """Per-source corpus audit — the rollup a mixing decision reads before
    setting domain weights: doc count, distinct languages, total chars,
    total tokens. Vectorized per-batch partials on (source, lang), tiny
    driver combine (source × lang cardinality is small by nature; at
    10^12 docs this is the same ≤ thousands-of-rows fold)."""
    from sick_ray.functions.text import add_token_count

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        b = add_token_count(batch)
        df = b.select(["source", "lang", "n_chars", "token_count"]).to_pandas()
        g = df.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_chars", "size"),
            total_chars=("n_chars", "sum"),
            total_tokens=("token_count", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    bylang = parts.groupby(["source", "lang"], as_index=False).sum()
    out = bylang.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"),
        n_langs=("lang", "nunique"),
        total_chars=("total_chars", "sum"),
        total_tokens=("total_tokens", "sum"),
    )
    for c in ("n_docs", "n_langs", "total_chars", "total_tokens"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_SOURCE_STATS = """
SELECT source,
       count(*) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_extract_all(text, '[0-9A-Za-z]+'))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY source
"""


MEDIA_AHASH_GOLDEN = "/root/repo/tests/golden/media_ahash_golden.parquet"


def q_media_ahash_near_dup(sf_dir: str):
    """AUDIO near-dup via the 56-bit integer-exact energy-envelope hash
    over REAL decoded PCM WAV samples (stages/multimodal.py::
    ahash_near_dup) — the audio twin of media_phash_near_dup, sharing
    the lossless 4-band hamming-≤3 machinery (hash_near_dup_pairs), so
    the oracle is again a full O(n²) bit_count(xor) self-join over a
    golden table computed by an independent scalar decode + int loop
    (make_media_golden.py::main_ahash)."""
    import ray.data as rd

    from sick_ray.stages.multimodal import ahash_near_dup, synth_audio_dups

    media = rd.from_arrow(synth_audio_dups(200, seed=13))
    return ahash_near_dup(media, num_partitions=QCFG.num_partitions,
                          concurrency=2)


SQL_MEDIA_AHASH_NEAR_DUP = f"""
WITH g AS (
  SELECT media_id, phash FROM read_parquet('{MEDIA_AHASH_GOLDEN}')
)
SELECT a.media_id AS u, b.media_id AS v,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS dist
FROM g a JOIN g b ON b.media_id > a.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""


SEARCH_PATTERNS = ["merge batch", "window table", "hash value"]


def q_substring_search_docs(sf_dir: str):
    """Corpus grep: one row per (doc, pattern) where the doc's text
    contains the literal pattern — vectorized pc.match_substring per
    pattern (pattern count is small; rows stay Arrow), zero shuffle.
    The streaming analogue of the reference's findRoot linear scan
    (EBAStructure.scala:34-36) applied to content instead of names."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def search(batch: pa.Table) -> pa.Table:
        ids, outs = batch.column("doc_id"), []
        for pat in SEARCH_PATTERNS:
            m = pc.match_substring(batch.column("text"), pat)
            hit = ids.filter(m)
            outs.append(pa.table(
                {
                    "doc_id": hit,
                    "pattern": pa.array([pat] * len(hit), type=pa.string()),
                }
            ))
        return pa.concat_tables(outs)

    return docs.map_batches(search, batch_format="pyarrow")


SQL_SUBSTRING_SEARCH_DOCS = """
SELECT d.doc_id, p.pattern
FROM documents d,
     (VALUES ('merge batch'), ('window table'), ('hash value')) AS p(pattern)
WHERE position(p.pattern IN d.text) > 0
"""


QUERIES = {
    # Insertion order is the driver's CORRECTNESS window (first 50
    # entries get the hard external oracle check per round). Rounds
    # 1-4 always checked the same head, so the 30 surfaces added
    # since mid-round-3 never got a driver row (VERDICT r4 item 2):
    # they go FIRST here, followed by the 50 previously-driver-green
    # names in their historical order. The repo-side preflight
    # (scripts/preflight.py) still checks all 80 every round.
    "stratified_sample_docs": q_stratified_sample_docs,
    "decontaminate_docs": q_decontaminate_docs,
    "embedding_centroids": q_embedding_centroids,
    "chunk_dedup_docs": q_chunk_dedup_docs,
    "cap_per_source": q_cap_per_source,
    "novelty_docs": q_novelty_docs,
    "quality_classifier": q_quality_classifier,
    "source_overlap": q_source_overlap,
    "dsir_score_docs": q_dsir_score_docs,
    "tfidf_top_terms": q_tfidf_top_terms,
    "kmeans_embeddings": q_kmeans_embeddings,
    "semdedup_embeddings": q_semdedup_embeddings,
    "events_distinct_users": q_events_distinct_users,
    "events_user_hll": q_events_user_hll,
    "top_terms_mg": q_top_terms_mg,
    "price_quantiles_sketch": q_price_quantiles_sketch,
    "curated_corpus": q_curated_corpus,
    "curated_packed": q_curated_packed,
    "url_dedup_docs": q_url_dedup_docs,
    "snapshot_dedup_docs": q_snapshot_dedup_docs,
    "shard_docs": q_shard_docs,
    "substring_search_docs": q_substring_search_docs,
    "snapshot_near_dup_docs": q_snapshot_near_dup_docs,
    "media_phash_near_dup": q_media_phash_near_dup,
    "media_ahash_near_dup": q_media_ahash_near_dup,
    "source_stats": q_source_stats,
    "events_window_dedup": q_events_window_dedup,
    "byte_stats_docs": q_byte_stats_docs,
    "url_deduped_curated": q_url_deduped_curated,
    "doc_spans_anchored": q_doc_spans_anchored,
    "media_frames": q_media_frames,
    "exact_dedup_docs": q_exact_dedup_docs,
    "dup_group_stats": q_dup_group_stats,
    "token_count_docs": q_token_count_docs,
    "token_count_bpe_docs": q_token_count_bpe_docs,
    "docs_stats_by_lang": q_docs_stats_by_lang,
    "filter_long_en_docs": q_filter_long_en_docs,
    "pricing_summary": q_pricing_summary,
    "top10_orders": q_top10_orders,
    "segment_revenue": q_segment_revenue,
    "region_nations": q_region_nations,
    "distinct_segments": q_distinct_segments,
    "events_hourly": q_events_hourly,
    "user_sessions": q_user_sessions,
    "props_path": q_props_path,
    "props_path_deep": q_props_path_deep,
    "knn_embeddings": q_knn_embeddings,
    "dedup_cluster_membership": q_dedup_cluster_membership,
    "simhash_docs": q_simhash_docs,
    "lang_id_docs": q_lang_id_docs,
    "quality_docs": q_quality_docs,
    "knn_lsh_embeddings": q_knn_lsh_embeddings,
    "knn_ivf_embeddings": q_knn_ivf_embeddings,
    "events_sliding_window": q_events_sliding_window,
    "media_decode_real": q_media_decode_real,
    "lineitem_stats": q_lineitem_stats,
    "orders_by_priority": q_orders_by_priority,
    "embedding_first_last": q_embedding_first_last,
    "ngram_exact_pairs": q_ngram_exact_pairs,
    "ngram_allpairs_jaccard": q_ngram_allpairs_jaccard,
    "ngram_allpairs_capped": q_ngram_allpairs_capped,
    "embedding_near_dup": q_embedding_near_dup,
    "winnow_fp_docs": q_winnow_fp_docs,
    "cosine_pairs_exact": q_cosine_pairs_exact,
    "top_terms": q_top_terms,
    "user_running_value": q_user_running_value,
    "prev_event_value": q_prev_event_value,
    "shipping_priority": q_shipping_priority,
    "json_subtree_stats": q_json_subtree_stats,
    "lineitem_decimal_totals": q_lineitem_decimal_totals,
    "narrow_int_widths": q_narrow_int_widths,
    "events_asof_purchase": q_events_asof_purchase,
    "events_range_count": q_events_range_count,
    "price_quantiles": q_price_quantiles,
    "gopher_repetition": q_gopher_repetition,
    "pii_redact_docs": q_pii_redact_docs,
    "sample_docs": q_sample_docs,
    "weighted_mix_docs": q_weighted_mix_docs,
    "pack_sequences": q_pack_sequences,
    "dedup_clusters_docs": q_dedup_clusters_docs,
    "doc_spans": q_doc_spans,
}

ORACLES = {
    "exact_dedup_docs": SQL_EXACT_DEDUP_DOCS,
    "dup_group_stats": SQL_DUP_GROUP_STATS,
    "token_count_docs": SQL_TOKEN_COUNT_DOCS,
    "token_count_bpe_docs": SQL_TOKEN_COUNT_BPE_DOCS,
    "docs_stats_by_lang": SQL_DOCS_STATS_BY_LANG,
    "filter_long_en_docs": SQL_FILTER_LONG_EN_DOCS,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top10_orders": SQL_TOP10_ORDERS,
    "segment_revenue": SQL_SEGMENT_REVENUE,
    "region_nations": SQL_REGION_NATIONS,
    "distinct_segments": SQL_DISTINCT_SEGMENTS,
    "events_hourly": SQL_EVENTS_HOURLY,
    "user_sessions": SQL_USER_SESSIONS,
    "props_path": SQL_PROPS_PATH,
    "props_path_deep": SQL_PROPS_PATH_DEEP,
    "knn_embeddings": SQL_KNN_EMBEDDINGS,
    # the LSH scale path recovers the exact top-k at sf0.01 (adaptive
    # planes + 1-bit multiprobe), so it shares the brute-force oracle —
    # the driver-enforced recall check VERDICT r2 asked for
    "knn_lsh_embeddings": SQL_KNN_EMBEDDINGS,
    "knn_ivf_embeddings": SQL_KNN_EMBEDDINGS,
    "lineitem_stats": SQL_LINEITEM_STATS,
    "orders_by_priority": SQL_ORDERS_BY_PRIORITY,
    "embedding_first_last": SQL_EMBEDDING_FIRST_LAST,
    "cosine_pairs_exact": SQL_COSINE_PAIRS_EXACT,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "snapshot_near_dup_docs": SQL_SNAPSHOT_NEAR_DUP_DOCS,
    "ngram_allpairs_jaccard": SQL_NGRAM_ALLPAIRS_JACCARD,
    "ngram_exact_pairs": SQL_NGRAM_EXACT_PAIRS,
    "ngram_allpairs_capped": SQL_NGRAM_ALLPAIRS_CAPPED,
    "dedup_cluster_membership": SQL_DEDUP_CLUSTER_MEMBERSHIP,
    "simhash_docs": SQL_SIMHASH_DOCS,
    "winnow_fp_docs": SQL_WINNOW_FP_DOCS,
    "lang_id_docs": SQL_LANG_ID_DOCS,
    "top_terms": SQL_TOP_TERMS,
    "user_running_value": SQL_USER_RUNNING_VALUE,
    "prev_event_value": SQL_PREV_EVENT_VALUE,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "json_subtree_stats": SQL_JSON_SUBTREE_STATS,
    "lineitem_decimal_totals": SQL_LINEITEM_DECIMAL_TOTALS,
    "narrow_int_widths": SQL_NARROW_INT_WIDTHS,
    "events_sliding_window": SQL_EVENTS_SLIDING_WINDOW,
    "events_asof_purchase": SQL_EVENTS_ASOF_PURCHASE,
    "events_range_count": SQL_EVENTS_RANGE_COUNT,
    "quality_docs": SQL_QUALITY_DOCS,
    "price_quantiles": SQL_PRICE_QUANTILES,
    "media_decode_real": SQL_MEDIA_DECODE_REAL,
    "gopher_repetition": SQL_GOPHER_REPETITION,
    "pii_redact_docs": SQL_PII_REDACT_DOCS,
    "sample_docs": SQL_SAMPLE_DOCS,
    "weighted_mix_docs": SQL_WEIGHTED_MIX_DOCS,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "stratified_sample_docs": SQL_STRATIFIED_SAMPLE_DOCS,
    "decontaminate_docs": SQL_DECONTAMINATE_DOCS,
    "embedding_centroids": SQL_EMBEDDING_CENTROIDS,
    "chunk_dedup_docs": SQL_CHUNK_DEDUP_DOCS,
    "cap_per_source": SQL_CAP_PER_SOURCE,
    "novelty_docs": SQL_NOVELTY_DOCS,
    "quality_classifier": SQL_QUALITY_CLASSIFIER,
    "source_overlap": SQL_SOURCE_OVERLAP,
    "dsir_score_docs": SQL_DSIR_SCORE_DOCS,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "curated_corpus": SQL_CURATED_CORPUS,
    "curated_packed": SQL_CURATED_PACKED,
    "kmeans_embeddings": SQL_KMEANS_EMBEDDINGS,
    "semdedup_embeddings": SQL_SEMDEDUP_EMBEDDINGS,
    "events_distinct_users": SQL_EVENTS_DISTINCT_USERS,
    "url_dedup_docs": SQL_URL_DEDUP_DOCS,
    "snapshot_dedup_docs": SQL_SNAPSHOT_DEDUP_DOCS,
    "shard_docs": SQL_SHARD_DOCS,
    "substring_search_docs": SQL_SUBSTRING_SEARCH_DOCS,
    "media_phash_near_dup": SQL_MEDIA_PHASH_NEAR_DUP,
    "media_ahash_near_dup": SQL_MEDIA_AHASH_NEAR_DUP,
    "source_stats": SQL_SOURCE_STATS,
    "events_window_dedup": SQL_EVENTS_WINDOW_DEDUP,
    "byte_stats_docs": SQL_BYTE_STATS_DOCS,
    "url_deduped_curated": SQL_URL_DEDUPED_CURATED,
    "doc_spans_anchored": SQL_DOC_SPANS_ANCHORED,
    # the three sketch surfaces, conformance-oracled (VERDICT r4 item 5):
    # HLL + bottom-k-quantiles against independent-scalar goldens
    # (deterministic outputs); MG shares the exact oracle in the
    # provably-exact regime (corpus vocab 31 «  cap 4096)
    "events_user_hll": SQL_EVENTS_USER_HLL,
    "top_terms_mg": SQL_TOP_TERMS,
    "price_quantiles_sketch": SQL_PRICE_QUANTILES_SKETCH,
    "media_frames": SQL_MEDIA_FRAMES,
    # dedup_clusters_docs / doc_spans: not SQL-expressible
    # (content-addressed ids, spans drift) → rows-only checks; each is
    # gated by a pytest oracle (golden tables or a second
    # implementation).
}
