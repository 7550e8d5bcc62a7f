"""Build an N×-scale fixture from an existing testdata dir by replication
with DISJOINT shifts — the scaling-measurement companion to TESTDATA.md's
driver-generated fixtures (which stop at sf0.1).

Why disjoint shifts and not plain copies: the heavy-tier operators under
measurement (minhash/simhash banding, embedding near-dup, IVF-PQ, per-user
range join) all scale in PAIR DENSITY, and verbatim replication would plant
factor-sized exact-duplicate cliques — pair counts would grow by
factor² (45 planted pairs per doc at 10×), measuring the fixture's
artifact, not the engine. Each replica k instead lives in its own space:

- documents: every word is tagged ``word~k`` (k>0), so word-3-gram shingle
  sets across replicas are DISJOINT — each replica reproduces sf0.1's
  internal near-dup structure exactly, and corpus-wide pair density scales
  linearly with the factor (the design claim under test);
- embeddings: replica vectors get a deterministic unit-noise push of
  0.6·||v|| (seed 42+k), dropping cross-replica cosine to ~0.86 of
  parallel — far below the 0.99s of planted copies — while intra-replica
  geometry is untouched; vec_ids shift by k·N so the fixed probe sets
  (vec_id < 5 / < 200) keep their sf0.1 size, as they would in a real
  train-once-query-few deployment;
- events: ids/users/time shift per replica (k·30 days keeps per-day
  density identical), so per-user ±window joins stay intra-replica.

Deterministic end to end (DuckDB SQL + seeded numpy). Output schema is
asserted identical to the source dir's, so load_table's dtype handling is
exercised unchanged.

Usage: python tools/make_scale_fixture.py SRC_DIR DST_DIR [FACTOR=10] [TABLES]
       [TAG_OFFSET=0]

TAG_OFFSET namespaces the documents word tags for CHAINED builds (see
_docs_sql): chain factor-1000 then factor-10 with TAG_OFFSET=1000 on the
second level, or the second level's re-tagged replica-0 rows collide
byte-identically with the first level's tagged replicas.

TABLES (optional, comma-separated) restricts the build to a subset —
the doc-tier third decade (factor 1000) builds only
``documents,embeddings,events``: the TPC-H fact tables at 1000× sf0.1
(~600M lineitems, ~60 GB) exceed the host's disk, and the third-decade
question being answered is about the LLM-data tier."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ("documents", "embeddings", "events", "customer", "orders", "lineitem")
DIM_TABLES = ("part", "supplier", "nation", "region")


def _docs_sql(src: str, factor: int, tag_offset: int = 0) -> str:
    """``tag_offset`` namespaces the word tags for CHAINED builds (r10):
    chaining a build with itself re-tags the UNTAGGED replica-0 rows of
    the first level, and a second-level suffix ``~j`` makes them
    byte-identical to the first level's replica j (``w`` + ``~9`` ==
    ``w~9``) — the 45M gate point measured exactly that as a 100%%
    duplicate batch. Passing an offset > the first level's max replica
    index (e.g. 1000 when chaining a factor-1000 build) keeps every
    level's tag vocabulary disjoint, preserving the linear pair-density
    claim across levels."""
    parts = []
    for k in range(factor):
        if k == 0:
            # replica 0 is always the source verbatim — a chained build's
            # lower-id prefix must reproduce the previous level exactly so
            # sub-range measurements stay comparable across levels
            parts.append(
                f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{src}')"
            )
        else:
            tag = k + tag_offset
            parts.append(
                f"""
                SELECT doc_id + {k} * (1 + (SELECT max(doc_id) FROM read_parquet('{src}'))) AS doc_id,
                       array_to_string(
                         list_transform(str_split(text, ' '), x -> x || '~{tag}'),
                         ' ') AS text,
                       lang, source,
                       CAST(length(array_to_string(
                         list_transform(str_split(text, ' '), x -> x || '~{tag}'),
                         ' ')) AS BIGINT) AS n_chars
                FROM read_parquet('{src}')"""
            )
    return " UNION ALL ".join(parts)


def _events_sql(src: str, factor: int) -> str:
    parts = []
    for k in range(factor):
        if k == 0:
            parts.append(f"SELECT * FROM read_parquet('{src}')")
        else:
            parts.append(
                f"""
                SELECT event_id + {k} * (1 + (SELECT max(event_id) FROM read_parquet('{src}'))) AS event_id,
                       ts + INTERVAL {k * 30} DAY AS ts,
                       user_id + {k} * (1 + (SELECT max(user_id) FROM read_parquet('{src}'))) AS user_id,
                       event_type, value, props
                FROM read_parquet('{src}')"""
            )
    return " UNION ALL ".join(parts)


def _scale_embeddings(src: str, dst: str, factor: int) -> None:
    """Streams one replica per row group through a ParquetWriter — the
    all-replicas-in-memory pylist form peaked at ~3 GB per million source
    rows and could not produce the r11 20M-vector (10x sf100) point."""
    t = pq.read_table(src)
    vec_type = t.schema.field("embedding").type
    col = t["embedding"].combine_chunks()
    flat = np.asarray(col.flatten())
    n = len(col)
    dim = flat.size // n
    v = flat.reshape(n, dim).astype(np.float64)
    ids = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    labels = t["label"].combine_chunks()
    offset = int(ids.max()) + 1
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    writer = pq.ParquetWriter(dst, t.schema)
    try:
        for k in range(factor):
            if k == 0:
                vk = v
            else:
                rng = np.random.default_rng(42 + k)
                u = rng.standard_normal(size=(n, dim))
                u /= np.linalg.norm(u, axis=1, keepdims=True)
                vk = v + 0.6 * norms * u
            flat32 = pa.array(vk.astype(np.float32).ravel())
            try:
                vec_arr = pa.FixedSizeListArray.from_arrays(flat32, dim).cast(
                    vec_type
                )
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                vec_arr = pa.array(
                    vk.astype(np.float32).tolist(), type=vec_type
                )
            writer.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(
                            ids + k * offset,
                            type=t.schema.field("vec_id").type,
                        ),
                        "embedding": vec_arr,
                        "label": labels,
                    },
                    schema=t.schema,
                )
            )
    finally:
        writer.close()


def _tpch_sql(src_dir: str, table: str, factor: int) -> str:
    """Replicate the TPC-H fact spine with per-replica key shifts that keep
    the customer->orders->lineitem join structure intact inside each
    replica: every key family shifts by k*(1+max(key)). Dimension keys
    (part/supp/nation) are NOT shifted — dimensions stay fixture-sized, as
    they would against a growing fact table, so join fan-out per dim row
    grows linearly (the scaling under test). Dates are untouched: filter
    selectivities stay constant per replica, volume scales linearly."""
    c = f"{src_dir}/customer.parquet"
    o = f"{src_dir}/orders.parquet"
    l = f"{src_dir}/lineitem.parquet"
    ck = f"(SELECT 1 + max(c_custkey) FROM read_parquet('{c}'))"
    ok = f"(SELECT 1 + max(o_orderkey) FROM read_parquet('{o}'))"
    parts = []
    for k in range(factor):
        if table == "customer":
            parts.append(
                f"""SELECT c_custkey + {k} * {ck} AS c_custkey, c_name,
                           c_nationkey, c_acctbal, c_mktsegment
                    FROM read_parquet('{c}')"""
            )
        elif table == "orders":
            parts.append(
                f"""SELECT o_orderkey + {k} * {ok} AS o_orderkey,
                           o_custkey + {k} * {ck} AS o_custkey,
                           o_orderstatus, o_totalprice, o_orderdate,
                           o_orderpriority
                    FROM read_parquet('{o}')"""
            )
        else:
            parts.append(
                f"""SELECT l_orderkey + {k} * {ok} AS l_orderkey, l_partkey,
                           l_suppkey, l_linenumber, l_quantity,
                           l_extendedprice, l_discount, l_tax, l_returnflag,
                           l_linestatus, l_shipdate
                    FROM read_parquet('{l}')"""
            )
    return " UNION ALL ".join(parts)


def main() -> int:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst_dir = sys.argv[2] if len(sys.argv) > 2 else "_scratch/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    tag_offset = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    built = [t for t in TABLES if only is None or t in only]
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    # a factor-F build is an F-part UNION ALL; the default parser depth
    # cap trips at F ~ 1000
    con.execute(f"SET max_expression_depth TO {max(1000, 4 * factor)}")
    if "documents" in built:
        con.execute(
            f"COPY ({_docs_sql(f'{src_dir}/documents.parquet', factor, tag_offset)}) "
            f"TO '{dst_dir}/documents.parquet' (FORMAT PARQUET)"
        )
    if "events" in built:
        con.execute(
            f"COPY ({_events_sql(f'{src_dir}/events.parquet', factor)}) "
            f"TO '{dst_dir}/events.parquet' (FORMAT PARQUET)"
        )
    if "embeddings" in built:
        _scale_embeddings(
            f"{src_dir}/embeddings.parquet", f"{dst_dir}/embeddings.parquet", factor
        )
    for t in ("customer", "orders", "lineitem"):
        if t in built:
            con.execute(
                f"COPY ({_tpch_sql(src_dir, t, factor)}) "
                f"TO '{dst_dir}/{t}.parquet' (FORMAT PARQUET)"
            )
    if only is None:
        for t in DIM_TABLES:  # dimensions copy through fixture-sized
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_dir}/{t}.parquet')) "
                f"TO '{dst_dir}/{t}.parquet' (FORMAT PARQUET)"
            )
    for t in built:
        src_schema = pq.read_schema(f"{src_dir}/{t}.parquet")
        dst_schema = pq.read_schema(f"{dst_dir}/{t}.parquet")
        for f in src_schema:
            g = dst_schema.field(f.name)
            assert str(f.type) == str(g.type), (t, f.name, f.type, g.type)
        n_src = pq.read_metadata(f"{src_dir}/{t}.parquet").num_rows
        n_dst = pq.read_metadata(f"{dst_dir}/{t}.parquet").num_rows
        assert n_dst == factor * n_src, (t, n_src, n_dst)
        print(f"{t}: {n_src} -> {n_dst} rows (x{factor})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
