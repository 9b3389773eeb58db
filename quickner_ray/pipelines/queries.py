"""Driver-contract query implementations (SURVEY.md §2 operators over the
shared testdata tables). Each function takes ``sf_dir`` and returns a Ray
Dataset / pandas DataFrame / pyarrow Table; matching DuckDB oracle SQL lives
in ``__ray_entry__.oracle_sql``. Column names are aligned with the SQL.

Ray is initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..kernel.rounding import round_away

from ..kernel.automaton import Gazetteer
from ..kernel.filters import Filters
from ..stages.canonicalize import add_triple_columns, canonical_entities, explode_mentions, label_counts
from ..stages.detect import detect_mentions
from ..stages.text_analysis import add_quality_counts, add_token_count

# Deterministic gazetteer over the synthetic documents vocabulary
# (multi-word names pin overlapping-match semantics; hot single words pin the
# skewed canonicalization path).
DEFAULT_GAZETTEER: list[tuple[str, str]] = [
    ("table scan", "OPERATOR"),
    ("hash join", "OPERATOR"),
    ("merge", "OPERATOR"),
    ("sort", "OPERATOR"),
    ("filter", "OPERATOR"),
    ("window", "OPERATOR"),
    ("agg", "OPERATOR"),
    ("scan", "OPERATOR"),
    ("join", "OPERATOR"),
    ("spark", "SYSTEM"),
    ("stream", "SYSTEM"),
    ("batch", "UNIT"),
    ("row", "UNIT"),
    ("column", "UNIT"),
    ("vector", "UNIT"),
    ("part", "UNIT"),
    ("customer", "ENTITY"),
    ("order", "ENTITY"),
    ("line", "ENTITY"),
    ("data", "CONCEPT"),
    ("query", "CONCEPT"),
    ("key", "CONCEPT"),
    ("value", "CONCEPT"),
    ("the fast key", "PHRASE"),
]


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _parity_filter(parity: int):
    """Schema-preserving doc_id-parity batch filter (even/odd split used by
    every train-vs-score and base-vs-delta query; ``Table.filter`` keeps the
    Arrow schema on empty batches, unlike a row-expression Dataset.filter)."""

    def f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return b.filter(pc.equal(pc.bit_wise_and(ids, 1), parity))

    return f


def _docs_half(sf_dir: str, parity: int):
    """documents(doc_id, text) restricted to one doc_id parity class."""
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _parity_filter(parity), batch_format="pyarrow"
    )


def documents_gazetteer(case_sensitive: bool = False) -> Gazetteer:
    return Gazetteer(DEFAULT_GAZETTEER, case_sensitive=case_sensitive)


def scaled_gazetteer(n_extra: int = 50_000, case_sensitive: bool = False) -> Gazetteer:
    """DEFAULT_GAZETTEER + ``n_extra`` deterministic synthetic names — the
    large-gazetteer configuration (10^4-10^5 names is the realistic KG
    regime; exercises trie compile + ray.put broadcast at size)."""
    extra = [(f"xent{i % 250} xv{i // 250}", "GEN") for i in range(n_extra)]
    return Gazetteer(DEFAULT_GAZETTEER + extra, case_sensitive=case_sensitive)


def annotated_documents(sf_dir: str, *, batch_size: int = 2048):
    """documents.parquet -> annotated Dataset (text path of the flagship)."""
    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    # small gazetteer -> detect_mentions picks the task-stage shape
    # (once-per-worker automaton, no actor-pool spin-up)
    return detect_mentions(ds, documents_gazetteer(), batch_size=batch_size)


_ANN_CACHE_VERSION = "v1"


def _corpus_cache_key(sf_dir: str, version: str) -> str:
    """Cache key bound to the SOURCE's identity (path+size+mtime) so a
    regenerated corpus can never serve a stale cache."""
    import hashlib

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{os.path.realpath(src)}:{st.st_size}:{st.st_mtime_ns}:{version}".encode()
    ).hexdigest()[:12]
    return f"{os.path.basename(os.path.normpath(sf_dir))}-{fp}"


def annotated_documents_cached(sf_dir: str):
    """Write-once annotated corpus shared by every downstream consumer.

    The graph/KG query family reads the annotated corpus many times
    (co-occurrence edges, canonicalization, timelines, random walks, ...);
    re-running detection per consumer multiplies the most expensive stage.
    This is the 100 TB shape made local: annotate ONCE -> write partitioned
    parquet -> each consumer re-reads (column-pruned, streaming) instead of
    re-detecting or pinning the whole corpus in the object store with
    ``materialize()``. Crash-safe: written to a temp dir and promoted with
    an atomic rename; keyed by source fingerprint (stale-guarded)."""
    import shutil

    import ray.data as rd

    from ..stages.detect import LABEL_TYPE

    d = f"/tmp/quickner_ray_ann_{_corpus_cache_key(sf_dir, _ANN_CACHE_VERSION)}"
    done = d + ".done"  # marker OUTSIDE the dir: the dir stays pure parquet
    if not os.path.exists(done):
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        annotated_documents(sf_dir).write_parquet(tmp)
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        with open(done, "w") as f:
            f.write("ok\n")

    def renorm(b: pa.Table) -> pa.Table:
        # parquet round-trip narrows large_string and loosens the
        # list<struct> nullability; restore the detector's exact schema
        idx = b.column_names.index("text")
        b = b.set_column(idx, "text", b.column("text").cast(pa.large_string()))
        li = b.column_names.index("label")
        return b.set_column(li, "label", b.column("label").cast(LABEL_TYPE))

    return rd.read_parquet(d).map_batches(renorm, batch_format="pyarrow")


def mentions_dataset(sf_dir: str, *, keep_text: bool = False):
    ann = annotated_documents_cached(sf_dir)
    return ann.map_batches(
        lambda b: explode_mentions(b, subj_col="doc_id", keep_text=keep_text),
        batch_format="pyarrow",
    )


def _explode_ann(ann, *, keep_text: bool = False):
    """Annotated-docs Dataset -> mentions Dataset. For SPLIT-SAFE consumers
    only (global groupbys, per-mention maps); doc-local per-batch kernels
    must instead fuse the explode via annotated=True so Ray's dynamic block
    splitting cannot separate a document's mentions."""
    return ann.map_batches(
        lambda b: explode_mentions(b, subj_col="doc_id", keep_text=keep_text),
        batch_format="pyarrow",
    )


# ---- oracle-checked queries -------------------------------------------------

def q_doc_dedup(sf_dir: str):
    """E1 exact dedup summary: one row per distinct text content
    (content hash, surviving id, duplicate count)."""
    from ray.data.aggregate import Count, Min

    from ..kernel.hashing import hash_texts

    def with_hash(b: pa.Table) -> pa.Table:
        return b.append_column(
            "text_hash", pa.array(hash_texts(b.column("text").to_pylist()))
        )

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(with_hash, batch_format="pyarrow")
    return ds.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dupes")
    )


def q_streaming_ingest_dedup(sf_dir: str):
    """Streaming ingest dedup: documents pushed through the sharded
    mutable registry (stages/ingest.py — raw-actor state, min-merge
    algebra); survivors == the batch doc_dedup groupby on any corpus."""
    from ..stages.ingest import streaming_ingest_dedup

    return streaming_ingest_dedup(_docs(sf_dir, columns=["doc_id", "text"]))


def q_filter_valid(sf_dir: str):
    """P1 filter (byte-length bounds) -> surviving doc ids."""
    from ..stages.filter_stage import filter_texts

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = filter_texts(ds, Filters(min_length=100, max_length=300))
    return ds.select_columns(["doc_id"])


def q_token_counts(sf_dir: str):
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_token_count, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens"])


def q_readability(sf_dir: str):
    """Flesch-Kincaid readability features, exact-integer rational grade
    (stages/text_analysis.add_readability)."""
    from ..stages.text_analysis import add_readability

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_readability, batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "n_words", "n_sentences", "n_syllables", "fk_num", "fk_den"]
    )


def q_bpe_token_counts(sf_dir: str):
    from ..stages.text_analysis import add_bpe_token_count

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_bpe_token_count, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_bpe_tokens"])


def q_quality_counts(sf_dir: str):
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_quality_counts, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_chars_m", "n_tokens", "n_punct", "n_digits", "n_spaces"])


def q_docs_by_lang(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def q_source_lang_stats(sf_dir: str):
    from ray.data.aggregate import Count, Mean

    ds = _docs(sf_dir, columns=["source", "lang", "n_chars"])
    return ds.groupby(["source", "lang"]).aggregate(
        Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars")
    )


def q_revenue_by_returnflag(sf_dir: str):
    """Grouped aggregate with a computed column (partial-aggregate shape)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))
        )
        return b.append_column("revenue", rev)

    ds = ds.map_batches(revenue, batch_format="pyarrow")
    agg = ds.groupby("l_returnflag").aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("revenue", alias_name="sum_revenue"),
        Count(alias_name="n_rows"),
    )

    def to_e4(b: pa.Table) -> pa.Table:
        # revenue rows are exact 4-decimal values; summation order drifts the
        # float sum by ~1 ulp across engines — emit round(sum*1e4) as int64
        # so the oracle comparison is bit-exact
        i = b.column_names.index("sum_revenue")
        v = pc.round(pc.multiply(b.column("sum_revenue"), pa.scalar(10000.0))).cast(
            pa.int64()
        )
        return b.set_column(i, "sum_revenue_e4", v)

    return agg.map_batches(to_e4, batch_format="pyarrow")


def q_orders_per_nation(sf_dir: str):
    """Broadcast join (small dim side shipped once) + grouped count."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    # nation is a true dim (25 rows); customer is fact-SIZED, broadcast here
    # as a compact Arrow table (two columns, zero-copy in the object store,
    # vectorized index_in/take lookups — never a Python dict). At 10^12-doc
    # scale, swap this stage for ds.join(customer, "inner", N) — the Arrow
    # broadcast holds far longer than a dict, but not forever.
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    # pre-resolve nation names onto the customer table driver-side (25-row dim)
    nidx = pc.index_in(
        cust.column("c_nationkey").combine_chunks(),
        value_set=nation.column("n_nationkey").combine_chunks(),
    )
    cust_keys = cust.column("c_custkey").combine_chunks()
    cust_names = nation.column("n_name").combine_chunks().take(nidx)
    lookup_ref = ray.put((cust_keys, cust_names))

    class AddNation:
        def __init__(self, ref):
            self.keys, self.names = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            col = b.column("o_custkey")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            idx = pc.index_in(col, value_set=self.keys)
            return b.append_column("n_name", self.names.take(idx))

    from ..stages.taskstate import task_stage

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"])
    ds = ds.map_batches(
        task_stage(AddNation, ref=lookup_ref), batch_format="pyarrow"
    )
    return ds.groupby("n_name").aggregate(Count(alias_name="n_orders"))


def q_orders_per_nation_shuffle(sf_dir: str):
    """The PARTITIONED-join path for fact-sized sides: orders ⋈ customer via
    Ray Data's hash-partitioned inner join (both sides shuffle on the key;
    bounded memory per partition — the 10^12-row shape), then the 25-row
    nation dim broadcast-attached, then grouped count. Same oracle as
    ``orders_per_nation`` (which demonstrates the broadcast shape)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"])
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    joined = orders.join(
        cust, "inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    ref = ray.put(
        (nation.column("n_nationkey").combine_chunks(), nation.column("n_name").combine_chunks())
    )

    class AttachNation:
        def __init__(self, ref):
            self.keys, self.names = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            col = b.column("c_nationkey")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            idx = pc.index_in(col, value_set=self.keys)
            return b.append_column("n_name", self.names.take(idx))

    from ..stages.taskstate import task_stage

    joined = joined.map_batches(
        task_stage(AttachNation, ref=ref), batch_format="pyarrow"
    )
    return joined.groupby("n_name").aggregate(Count(alias_name="n_orders"))


def q_similarity_topk(sf_dir: str, k: int = 10, query_id: int = 0):
    """Brute-force cosine top-k over the embeddings table: the broadcast
    query vector is applied per batch with a vectorized matmul; per-batch
    candidates then a tiny global sort+limit."""
    import ray.data as rd

    from ..stages.similarity import fetch_vector

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = fetch_vector(emb_path, query_id)  # row-group-pruned single-row read
    qnorm = np.linalg.norm(qvec)
    dim = len(qvec)

    def score(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ qvec) / (norms * qnorm)
        cos = round_away(cos, 6)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # local survivors picked in the GLOBAL (cos DESC, vec_id ASC)
        # order (lexsort tiebreak, the ivfpq.local_topk rule) — a cos tie
        # spanning the local boundary must keep the row the final sort
        # keeps, or the pruning is nondeterministic vs the SQL oracle
        top = np.lexsort((ids, -cos))[: min(k, len(cos))]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[top], type=pa.int64()),
                "cos_sim": pa.array(cos[top], type=pa.float64()),
            }
        )

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    ds = ds.map_batches(score, batch_format="pyarrow")
    return ds.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)


def q_similarity_topk_batch(
    sf_dir: str, k: int = 10, query_ids: tuple = (0, 1, 2)
):
    """BATCHED brute-force cosine top-k — the real serving shape: Q query
    vectors broadcast as ONE matrix, each corpus batch scored with a
    single (n × dim)·(dim × Q) matmul, then a per-(query, batch) local
    top-k so <= k·Q rows leave each batch; the finish is one grouped
    top-k (stages/topk.grouped_topk — k × Q × batches shuffle volume).
    round(6) absorbs GEMM-vs-GEMV summation-order ulps exactly as the
    single-query oracle does."""
    import ray.data as rd

    from ..stages.similarity import fetch_vector
    from ..stages.topk import grouped_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qmat = np.stack([fetch_vector(emb_path, q) for q in query_ids])
    qnorms = np.linalg.norm(qmat, axis=1)
    dim = qmat.shape[1]
    qids = np.asarray(query_ids, dtype=np.int64)

    def score(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = (
            col.flatten().to_numpy(zero_copy_only=False)
            .astype(np.float64).reshape(-1, dim)
        )
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ qmat.T) / (norms[:, None] * qnorms[None, :])
        cos = round_away(cos, 6)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_local = min(k, len(ids))
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            c = cos[:, qi]
            # prefix of the global (cos DESC, vec_id ASC) order — ties at
            # the local top-k boundary resolve exactly as the oracle's
            # ORDER BY does (see q_similarity_topk / ivfpq.local_topk)
            top = np.lexsort((ids, -c))[:n_local]
            out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_c.append(c[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos_sim": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    ds = ds.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        ds, "query_id", ["cos_sim", "vec_id"], k, descending=[True, False]
    )


def sql_similarity_topk_batch(k: int = 10, query_ids: tuple = (0, 1, 2)) -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT * FROM (SELECT {q} AS query_id, vec_id,"
        f" ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),"
        f" (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings"
        f" WHERE vec_id = {q})), 6) AS cos_sim"
        f" FROM embeddings ORDER BY cos_sim DESC, vec_id LIMIT {k}) a{q}"
        for q in query_ids
    )
    return arms


# ---- approximate dedup / similarity (oracle-checked) ------------------------

def q_minhash_signatures(sf_dir: str):
    """MinHash signatures, long form (doc_id, perm_id, sig)."""
    from ..stages.dedup_approx import minhash_signatures_long

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(minhash_signatures_long, batch_format="pyarrow")


def q_minhash_lsh_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs verified by exact n-gram
    Jaccard (>= 0.5)."""
    from ..stages.dedup_approx import lsh_dup_pairs

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return lsh_dup_pairs(ds, threshold=0.5)


def q_minhash_dedup_docs(sf_dir: str):
    """Greedy keep-first near-dup dedup: surviving doc ids. The pair list is
    NEVER collected driver-side — ``anti_join`` broadcasts it only when it is
    measurably small, else runs a hash-partitioned ``left_anti`` shuffle
    (web-text drop sets are corpus-proportional at scale)."""
    from ..stages.antijoin import anti_join
    from ..stages.dedup_approx import lsh_dup_pairs

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    pairs = lsh_dup_pairs(ds, threshold=0.5)
    return anti_join(_docs(sf_dir, columns=["doc_id"]), "doc_id", pairs, "doc_b")


def q_dup_clusters(sf_dir: str):
    """Near-duplicate CLUSTERS: weakly-connected components over the
    verified LSH pair graph (the principled dedup shape — keep one doc per
    component instead of greedily dropping pair right-sides). Distributed
    min-label propagation with pointer jumping; every doc appears, with
    singletons labelling themselves."""
    from ..stages.dedup_approx import lsh_dup_pairs
    from ..stages.graph_cc import _project, connected_components

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    pairs = lsh_dup_pairs(ds, threshold=0.5)
    cc = connected_components(
        pairs,
        src_col="doc_a",
        dst_col="doc_b",
        nodes=_docs(sf_dir, columns=["doc_id"]),
        node_col="doc_id",
    )
    return _project(cc, {"doc_id": "node", "component": "component"})


FUZZY_NAMES = [
    "spark", "window", "table", "filter", "merge", "sort", "vector", "batch"
]


P99 = 0.99


def q_events_zorder(sf_dir: str):
    """Z-order data-clustering keys per event: Morton interleave of
    (user_id, 256-second time bucket) — the multi-column sort key whose
    contiguous ranges are 2-D tiles (stages/zorder.py). Sorting parquet
    output by zkey makes row-group min/max stats prune BOTH user and time
    range predicates."""
    import pyarrow.compute as pc

    from ..stages.zorder import add_zorder_key

    def prep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                }
            )
        secs = pc.divide(pc.cast(b.column("ts"), pa.int64()), 1_000_000)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "a": b.column("user_id"),
                "b": pc.divide(secs, 256),
            }
        )

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts", "user_id"]
    )
    ds = ds.map_batches(prep, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: add_zorder_key(t, "a", "b").select(["event_id", "zkey"])
        if t.num_rows
        else pa.table(
            {"event_id": pa.array([], type=pa.int64()),
             "zkey": pa.array([], type=pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return ds


def sql_events_zorder() -> str:
    from ..stages.zorder import sql_zorder_expr

    a = "(user_id & 65535)"
    b = "((epoch_us(ts) // 1000000 // 256) & 65535)"
    return (
        f"SELECT event_id, {sql_zorder_expr(a, b)} AS zkey FROM events"
    )


def q_events_above_p99(sf_dir: str):
    """Quantile-threshold anomaly filter: the exact global p99 of the
    continuous value column (distributed quickselect — no global sort)
    broadcasts as a scalar predicate; matching events stream through a
    zero-shuffle filter. The composition a monitoring pipeline runs."""
    import ray.data as rd

    from ..stages.rank import exact_quantiles

    path = os.path.join(sf_dir, "events.parquet")
    vals = rd.read_parquet(path, columns=["value"])
    (_, p99), = exact_quantiles(vals, "value", [P99])

    ds = rd.read_parquet(path, columns=["event_id", "user_id", "value"])

    def above(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("value"), pa.scalar(float(p99))))

    return ds.map_batches(above, batch_format="pyarrow")


def sql_events_above_p99() -> str:
    return (
        f"SELECT event_id, user_id, value FROM events\n"
        f"WHERE value >= (SELECT quantile_disc(value, {P99}) FROM events)"
    )


def q_orders_monthly_growth(sf_dir: str):
    """Time-bucketed trend: orders per calendar month plus the
    month-over-month delta — a LAG window over the (tiny) aggregate
    output, computed driver-side after the distributed month count."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate"]
    )

    def to_month(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").combine_chunks().cast(pa.timestamp("us"))
        y = pc.year(d).cast(pa.int64())
        m = pc.month(d).cast(pa.int64())
        month = pc.add(pc.multiply(y, pa.scalar(100, type=pa.int64())), m)
        return pa.Table.from_pydict({"month": month})

    agg = (
        ds.map_batches(to_month, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n_orders"))
    )

    def add_delta(b: pa.Table) -> pa.Table:
        month = b.column("month").to_numpy(zero_copy_only=False).astype(np.int64)
        n = b.column("n_orders").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(month, kind="stable")
        month, n = month[order], n[order]
        delta = np.empty(len(n), dtype=np.int64)
        if len(n):
            delta[0] = 0
            delta[1:] = n[1:] - n[:-1]
        return pa.Table.from_pydict(
            {
                "month": pa.array(month),
                "n_orders": pa.array(n),
                "delta": pa.array(delta),
            }
        )

    # months-per-corpus is tiny: one block, one vectorized LAG pass
    return agg.repartition(1).map_batches(add_delta, batch_format="pyarrow")


def sql_orders_monthly_growth() -> str:
    return (
        "SELECT month, n_orders,\n"
        "  CAST(coalesce(n_orders - lag(n_orders) OVER (ORDER BY month), 0)\n"
        "    AS BIGINT) AS delta\n"
        "FROM (SELECT year(o_orderdate) * 100 + month(o_orderdate) AS month,\n"
        "        CAST(count(*) AS BIGINT) AS n_orders\n"
        "      FROM orders GROUP BY month)"
    )


VAL_PCT = 10
EPOCH_SEED = 7


def q_epoch_shuffle(sf_dir: str):
    """Deterministic global training-order shuffle: every doc gets a
    seeded md5 shuffle key and an exact 1-based epoch position via the
    range-partitioned sort + zipWithIndex ordinals (rank.global_row_number)
    — the same order on every run/cluster size, resumable mid-epoch by
    filtering epoch_pos > checkpoint. Changing EPOCH_SEED reshuffles.
    Shuffle keys come from the batch-vectorized md5 kernel
    (kernel/md5vec.md5_hex — bit-identical to hashlib/DuckDB md5)."""
    import pyarrow.compute as pc

    from ..kernel.md5vec import md5_hex
    from ..stages.rank import global_row_number

    ds = _docs(sf_dir, columns=["doc_id"])

    def key(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").combine_chunks().cast(pa.string())
        seeded = pc.binary_join_element_wise(
            pa.scalar(f"{EPOCH_SEED}:"), ids, pa.scalar("")
        )
        return pa.Table.from_pydict(
            {"doc_id": b.column("doc_id"), "k": md5_hex(seeded)}
        )

    ds = ds.map_batches(key, batch_format="pyarrow")
    out = global_row_number(ds, ["k"], out_col="epoch_pos")
    return out.select_columns(["doc_id", "epoch_pos"])


def sql_epoch_shuffle() -> str:
    return (
        f"SELECT doc_id, CAST(row_number() OVER (\n"
        f"  ORDER BY md5('{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR))\n"
        f") AS BIGINT) AS epoch_pos FROM documents"
    )


N_FOLDS = 5


def q_train_val_split(sf_dir: str):
    """Deterministic hash-based train/val split + CV fold assignment —
    zero-shuffle, reproducible at any parallelism, stable under corpus
    growth (a doc's split never changes when other docs arrive). Uses the
    shared md5-derived h64 so the SQL oracle recomputes identical buckets
    (md5_number_upper), computed by the batch-vectorized md5 kernel
    (kernel/md5vec) on the tiny doc_id-only projection."""
    from ..kernel.md5vec import md5_h64

    ds = _docs(sf_dir, columns=["doc_id"])

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").combine_chunks().cast(pa.string())
        h = md5_h64(ids)
        bucket = (h % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < 100 - VAL_PCT, "train", "val")
        fold = (h % np.uint64(N_FOLDS)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": b.column("doc_id"),
                "split": pa.array(split.astype(object), type=pa.string()),
                "fold": pa.array(fold),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def sql_train_val_split() -> str:
    return (
        f"SELECT doc_id,\n"
        f"  CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100\n"
        f"       < {100 - VAL_PCT} THEN 'train' ELSE 'val' END AS split,\n"
        f"  CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % {N_FOLDS}\n"
        f"    AS BIGINT) AS fold\n"
        f"FROM documents"
    )


URL_BLOCKLIST = ["spam7.example.com", "ads-net.io", "host11.example.com"]


def q_url_filtered_docs(sf_dir: str):
    """URL/host hygiene filter over the documents table. The documents
    table carries no url column, so a deterministic crawl-style URL is
    derived from (source, doc_id) — the same derivation runs in the SQL
    oracle — then the broadcast-blocklist host filter (subdomain-suffix
    semantics, one anchored RE2 alternation per batch) drops blocked pages.
    Hosts hash to 32 buckets so the blocklist actually fires; one entry is
    a SUBDOMAIN parent to exercise the suffix rule."""
    from ..stages.urlfilter import add_host, filter_hosts

    ds = _docs(sf_dir, columns=["doc_id", "source"])

    def with_url(b: pa.Table) -> pa.Table:
        # url = https://{sub.}hostN.example.com/{source}/{doc_id}
        did = b.column("doc_id").combine_chunks().cast(pa.string())
        n = pc.binary_length(did).cast(pa.int64())  # deterministic, cheap
        bucket = pc.add(
            pc.multiply(n, pa.scalar(7, type=pa.int64())),
            pc.utf8_length(b.column("source").combine_chunks()).cast(pa.int64()),
        )
        host_id = pc.binary_join_element_wise(
            pa.array(["host"] * len(b), type=pa.string()),
            pc.cast(
                pc.bit_wise_and(bucket, pa.scalar(31, type=pa.int64())), pa.string()
            ),
            "",
        )
        sub = pc.if_else(
            pc.equal(
                pc.bit_wise_and(n, pa.scalar(1, type=pa.int64())),
                pa.scalar(1, type=pa.int64()),
            ),
            pa.scalar("www.", type=pa.string()),
            pa.scalar("", type=pa.string()),
        )
        url = pc.binary_join_element_wise(
            pa.array(["https://"] * len(b), type=pa.string()),
            sub,
            host_id,
            pa.array([".example.com/"] * len(b), type=pa.string()),
            b.column("source").combine_chunks(),
            pa.array(["/"] * len(b), type=pa.string()),
            did,
            "",
        )
        return b.append_column("url", url)

    ds = ds.map_batches(with_url, batch_format="pyarrow")
    ds = filter_hosts(ds, URL_BLOCKLIST)
    ds = add_host(ds)
    return ds.select_columns(["doc_id", "host"])


def sql_url_filtered_docs() -> str:
    alts = "|".join(
        h.lower().replace(".", "\\.") for h in sorted(set(URL_BLOCKLIST))
    )
    return (
        f"WITH u AS (\n"
        f"  SELECT doc_id,\n"
        f"    'https://' || CASE WHEN length(CAST(doc_id AS VARCHAR)) % 2 = 1\n"
        f"        THEN 'www.' ELSE '' END\n"
        f"      || 'host' || CAST(\n"
        f"        (length(CAST(doc_id AS VARCHAR)) * 7 + length(source)) % 32\n"
        f"        AS VARCHAR)\n"
        f"      || '.example.com/' || source || '/' || CAST(doc_id AS VARCHAR)\n"
        f"      AS url\n"
        f"  FROM documents\n"
        f"), h AS (\n"
        f"  SELECT doc_id,\n"
        f"    lower(regexp_replace(regexp_extract(url,\n"
        f"      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1), ':[0-9]+$', ''))\n"
        f"      AS host\n"
        f"  FROM u\n"
        f")\n"
        f"SELECT doc_id, host FROM h\n"
        f"WHERE NOT regexp_matches(host, '(^|\\.)({alts})$')"
    )


SNB_WINDOW = 4


def q_sorted_neighborhood_pairs(sf_dir: str):
    """Sorted-neighborhood ER blocking over the corpus: records sorted
    globally by a normalized key (first 16 chars of the lowered text),
    each paired with its next SNB_WINDOW neighbors (stages/blocking.py —
    one global sort, bucketed self-join, pair volume n x window by
    construction)."""
    from ..stages.blocking import sorted_neighborhood_pairs

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        t = b.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        key = pc.utf8_slice_codeunits(pc.utf8_lower(t), 0, 16)
        return pa.table({"doc_id": b.column("doc_id"), "key": key})

    ds = ds.map_batches(keyed, batch_format="pyarrow")
    out = sorted_neighborhood_pairs(ds, ["key"], "doc_id", window=SNB_WINDOW)
    from ..stages.graph_cc import _project

    return _project(out, {"doc_a": "id_a", "doc_b": "id_b", "dist": "dist"})


def sql_sorted_neighborhood_pairs() -> str:
    return (
        f"WITH k AS (SELECT doc_id, substr(lower(text), 1, 16) AS key\n"
        f"  FROM documents),\n"
        f"r AS (SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS rn\n"
        f"  FROM k)\n"
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,\n"
        f"  CAST(b.rn - a.rn AS BIGINT) AS dist\n"
        f"FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + {SNB_WINDOW}"
    )


def q_fuzzy_name_matches(sf_dir: str):
    """Approximate string join (Levenshtein <= 1) between the corpus
    vocabulary and a reference name list, via SymSpell deletion-variant
    blocking + exact verify."""
    from ..stages.fuzzy import fuzzy_match_names

    return fuzzy_match_names(
        _docs(sf_dir, columns=["doc_id", "text"]), FUZZY_NAMES
    )


def sql_fuzzy_name_matches() -> str:
    from ..stages.fuzzy import sql_fuzzy_match_names

    return sql_fuzzy_match_names(FUZZY_NAMES)


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware near-dup dedup — the composition a production corpus
    run actually wants: connected components over the verified LSH pair
    graph, joined with the vectorized quality score, keeping the
    HIGHEST-quality doc per cluster (ties to the smaller doc_id) instead of
    the arbitrary min-id. One hash join on doc_id + the combiner-bounded
    grouped top-1 on the component key."""
    from ..stages.text_analysis import add_quality_score
    from ..stages.topk import grouped_topk

    from ..stages.hashjoin import bucketed_inner_join

    clusters = q_dup_clusters(sf_dir)
    quality = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(add_quality_score, batch_format="pyarrow")
        .select_columns(["doc_id", "quality_score"])
    )
    joined = bucketed_inner_join(
        clusters,
        quality,
        on=("doc_id",),
        n_buckets=64,
        left_types={"doc_id": pa.int64(), "component": pa.int64()},
        right_types={"doc_id": pa.int64(), "quality_score": pa.int64()},
    )
    return grouped_topk(
        joined, "component", ["quality_score", "doc_id"], 1, descending=True
    ).select_columns(["component", "doc_id", "quality_score"])


def sql_dedup_keep_best() -> str:
    from ..stages.dedup_approx import sql_dup_clusters
    from ..stages.text_analysis import sql_quality_score

    return (
        f"SELECT c.component, c.doc_id, qs.quality_score\n"
        f"FROM ({sql_dup_clusters(0.5)}) c\n"
        f"JOIN ({sql_quality_score()}) qs USING (doc_id)\n"
        f"QUALIFY row_number() OVER (PARTITION BY c.component\n"
        f"  ORDER BY qs.quality_score DESC, c.doc_id) = 1"
    )


def q_dup_cluster_sizes(sf_dir: str):
    """Corpus-quality report: histogram of near-dup cluster sizes
    (cluster_size, n_clusters) — two small aggregates over the connected
    components (the per-component count is bounded by doc count, the
    histogram by max cluster size)."""
    from ray.data.aggregate import Count

    cc = q_dup_clusters(sf_dir)
    sizes = cc.groupby("component").aggregate(Count(alias_name="cluster_size"))
    return sizes.groupby("cluster_size").aggregate(Count(alias_name="n_clusters"))


def q_simhash(sf_dir: str):
    """64-bit SimHash fingerprint per document."""
    from ..stages.dedup_approx import simhash_batch

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


def q_simhash_dup_pairs(sf_dir: str):
    """SimHash hamming near-dup pairs: 16-bit band bucketing (pigeonhole-
    complete for hamming <= 3), within-bucket pairwise popcount, capped +
    QUALIFY-mirrored; one band-key shuffle + a tiny pair dedup groupby."""
    from ..stages.dedup_approx import simhash_dup_pairs

    return simhash_dup_pairs(_docs(sf_dir, columns=["doc_id", "text"]))


def q_embedding_topk_pairs(sf_dir: str, k: int = 20):
    """Top-k most-similar embedding pairs (brute-force cosine; near-dup
    detection over the embedding column)."""
    from ..stages.dedup_approx import embedding_topk_pairs

    return embedding_topk_pairs(os.path.join(sf_dir, "embeddings.parquet"), k=k)


def q_lm_bigram_scores(sf_dir: str):
    """CCNet-style LM quality scoring, integer-exact: even-doc_id docs
    train an exact bigram count table, odd-doc_id docs are scored against
    it via a hash-partitioned bigram-key shuffle join (the LM table of a
    web corpus is itself fact-sized — never broadcast)."""
    from ..stages.lm import lm_bigram_scores

    return lm_bigram_scores(_docs_half(sf_dir, 0), _docs_half(sf_dir, 1))


def q_unicode_nfc(sf_dir: str):
    """Unicode NFC normalization over a deterministically DECOMPOSED copy
    of the corpus (every 'e' replaced by 'e' + U+0301) so the composition
    pass does real work on the ASCII test corpus — char counts before and
    after prove it. Zero shuffles."""
    import pyarrow.compute as pc

    from ..stages.text_analysis import add_nfc_normalized

    def decompose(b: pa.Table) -> pa.Table:
        t = b.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return b.set_column(
            b.column_names.index("text"),
            "text",
            pc.replace_substring(t, "e", "é"),
        )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        decompose, batch_format="pyarrow"
    )
    ds = ds.map_batches(add_nfc_normalized, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "text_nfc", "n_chars_raw", "n_chars_nfc"])


def q_classifier_scores(sf_dir: str):
    """Quality-classifier inference (fastText shape): hashed bag-of-words
    linear model scored per document — weight LUT built once per worker,
    per-batch vectorized tokenize + take + segment-sum, zero shuffles."""
    from ..stages.classifier import classifier_scores

    return classifier_scores(_docs(sf_dir, columns=["doc_id", "text"]))


def q_dsir_stats(sf_dir: str):
    """DSIR importance sufficient statistics: even docs are the TARGET
    corpus, odd docs the RAW corpus; each raw doc gets exact integer
    (n_grams, t_hits, r_hits) over hashed-bigram buckets. Both models are
    hashing-trick-BOUNDED (D=8192 ints) so they broadcast — the opposite
    shape from lm_bigram_scores' corpus-sized LM shuffle join."""
    from ..stages.dsir import dsir_stats

    return dsir_stats(
        _docs_half(sf_dir, 0), _docs_half(sf_dir, 1), _docs_half(sf_dir, 1)
    )


def q_ccnet_buckets(sf_dir: str):
    """CCNet's head/middle/tail split, end to end: LM-score the crawl side
    against the reference-side bigram model (lm_bigram_scores), rank docs
    by familiarity — the n_known/n_bigrams rate as an exact SCALED-INTEGER
    quotient (n_known * 1e9 // n_bigrams; no IEEE division to drift) — and
    NTILE(3) the ranking into quality terciles. Composition: one LM
    shuffle join + one range-partitioned sort."""
    import ray.data as rd

    from ..stages.lm import lm_bigram_scores
    from ..stages.rank import global_row_number, ntile_from_rn

    scores = lm_bigram_scores(_docs_half(sf_dir, 0), _docs_half(sf_dir, 1))

    def fam(b: pa.Table) -> pa.Table:
        nb = b.column("n_bigrams")
        if isinstance(nb, pa.ChunkedArray):
            nb = nb.combine_chunks()
        keep = pc.greater(nb, pa.scalar(0, type=pa.int64()))
        b = b.filter(keep)
        f = pc.divide(
            pc.multiply_checked(
                b.column("n_known").combine_chunks()
                if isinstance(b.column("n_known"), pa.ChunkedArray)
                else b.column("n_known"),
                pa.scalar(1_000_000_000, type=pa.int64()),
            ),
            b.column("n_bigrams"),
        )
        return pa.table({"doc_id": b.column("doc_id"), "fam": f})

    ds = scores.map_batches(fam, batch_format="pyarrow")
    ds = global_row_number(ds, ["fam", "doc_id"], descending=[True, False])
    total = ds.count()

    def derive(b: pa.Table) -> pa.Table:
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ntile_from_rn(rn, total, 3)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "fam": b.column("fam"),
                "bucket": pa.array(bucket, type=pa.int64()),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")


def sql_ccnet_buckets() -> str:
    from ..stages.lm import sql_lm_bigram_scores

    return (
        f"WITH s AS ({sql_lm_bigram_scores()}),\n"
        f"f AS (SELECT doc_id, n_known * 1000000000 // n_bigrams AS fam\n"
        f"  FROM s WHERE n_bigrams > 0)\n"
        f"SELECT doc_id, CAST(fam AS BIGINT) AS fam,\n"
        f"  CAST(ntile(3) OVER (ORDER BY fam DESC, doc_id) AS BIGINT) AS bucket\n"
        f"FROM f"
    )


def q_hyperplane_buckets(sf_dir: str):
    """Random-hyperplane LSH bucket signature per embedding (the shuffle
    key for embedding near-dup at scale; bit-exact sign test vs the SQL
    oracle's literal-coefficient dot chains)."""
    import ray.data as rd

    from ..stages.dedup_approx import add_hyperplane_bucket

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return ds.map_batches(add_hyperplane_bucket, batch_format="pyarrow")


def q_embedding_lsh_pairs(sf_dir: str):
    """Embedding near-dup candidate pairs: one shuffle on the hyperplane
    bucket key, exact cosine within buckets only — the 10^9-vector scale
    path (vs the brute-force all-pairs oracle)."""
    import ray.data as rd

    from ..stages.dedup_approx import embedding_lsh_pairs

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return embedding_lsh_pairs(ds)


# value bands for the broadcast range join (lo, hi, name); the last band's
# hi is an open-ended sentinel
EVENT_VALUE_BANDS: list[tuple[float, float, str]] = [
    (0.0, 50.0, "b0_small"),
    (50.0, 100.0, "b1_mid"),
    (100.0, 200.0, "b2_large"),
    (200.0, 350.0, "b3_xl"),
    (350.0, 1e9, "b4_huge"),
]


def q_events_value_bands(sf_dir: str):
    """Broadcast RANGE JOIN: assign each event's value to an interval band
    (searchsorted against the broadcast band table, no shuffle), then a
    grouped aggregate. Money emitted as per-row cents ints so the
    cross-engine sum compares exactly."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..stages.rangejoin import band_join

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])
    ds = band_join(ds, EVENT_VALUE_BANDS, value_col="value")

    def cents(b: pa.Table) -> pa.Table:
        e2 = pc.round(pc.multiply(b.column("value"), pa.scalar(100.0)))
        return b.append_column("value_e2", e2.cast(pa.int64()))

    ds = ds.map_batches(cents, batch_format="pyarrow")
    return ds.groupby("band").aggregate(
        Count(alias_name="n_events"), Sum("value_e2", alias_name="sum_value_e2")
    )


def sql_events_value_bands() -> str:
    rows = ", ".join(f"({lo}, {hi}, '{n}')" for lo, hi, n in EVENT_VALUE_BANDS)
    return (
        f"WITH bands(lo, hi, band) AS (VALUES {rows})\n"
        f"SELECT b.band, count(*) AS n_events,\n"
        f"  CAST(sum(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_e2\n"
        f"FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi\n"
        f"GROUP BY b.band"
    )


def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER hash-partitioned join: every customer with their order
    count, zero-order customers included (the join shape the inner/semi/
    anti variants can't express). Null-side rows count as 0 via a
    vectorized null flag before the grouped sum."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    joined = cust.join(
        orders, "left_outer", num_partitions=8,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def flag(b: pa.Table) -> pa.Table:
        has = pc.cast(pc.is_valid(b.column("o_orderkey")), pa.int64())
        return pa.table(
            {"c_custkey": b.column("c_custkey"), "has_order": has}
        )

    joined = joined.map_batches(flag, batch_format="pyarrow")
    return joined.groupby("c_custkey").aggregate(
        Sum("has_order", alias_name="n_orders")
    )


def sql_customer_order_counts() -> str:
    return (
        "SELECT c_custkey, count(o_orderkey) AS n_orders\n"
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey\n"
        "GROUP BY c_custkey"
    )


GLOBAL_QUANTILES = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def q_event_value_global_quantiles(sf_dir: str):
    """EXACT global quantiles of the continuous value column with no global
    sort: distributed quickselect by histogram refinement (O(levels)
    counting passes, driver memory bounded by bins + the final sliver)."""
    import ray.data as rd

    from ..stages.rank import exact_quantiles

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])
    pairs = exact_quantiles(ds, "value", GLOBAL_QUANTILES)
    return rd.from_arrow(
        pa.table(
            {
                "q": pa.array([p[0] for p in pairs], type=pa.float64()),
                "value": pa.array([p[1] for p in pairs], type=pa.float64()),
            }
        )
    )


def sql_event_value_global_quantiles() -> str:
    parts = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, quantile_disc(value, {q}) AS value"
        f" FROM events"
        for q in GLOBAL_QUANTILES
    )
    return parts


def q_normalized_text(sf_dir: str):
    """C4-style normalization (lower, collapse whitespace, trim) — pure
    vectorized per-batch kernels."""
    from ..stages.text_analysis import add_normalized_text

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_normalized_text, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "norm_text", "n_chars_norm"])


def q_hll_user_registers(sf_dir: str):
    """Mergeable HyperLogLog cardinality sketch over event users: sparse
    per-batch partial registers, one bucket-bounded groupby-max. The
    register table is deterministic, hence exactly oracle-checkable; the
    estimate derived from it is pinned by tests."""
    import ray.data as rd

    from ..stages.sketch import hll_registers

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    return hll_registers(ds, "user_id")


def q_hll_users_by_type(sf_dir: str):
    """GROUPED approximate COUNT DISTINCT: per-event-type HLL register
    tables (distinct users per event type) — one shuffle bounded by
    groups x 4096 registers, independent of row count. Registers are
    deterministic, hence exactly oracle-checkable."""
    from ..stages.sketch import hll_registers_grouped

    ds = _events(sf_dir, columns=["event_type", "user_id"])
    return hll_registers_grouped(ds, "user_id", "event_type")


def q_shard_assignments(sf_dir: str):
    """Consistent-hashing shard plan for the corpus: each doc key lands on
    the first ring vnode clockwise from its md5 hash (stages/sharding.py)
    — the partition layout that moves only ~1/(N+1) of keys on a cluster
    resize (vs ~all for hash-mod). Zero shuffles; ring broadcast as a
    64-int constant."""
    from ..stages.sharding import assign_shards

    ds = _docs(sf_dir, columns=["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table(
            {"key": b.column("doc_id").combine_chunks().cast(pa.string())}
        )

    return assign_shards(ds.map_batches(keyed, batch_format="pyarrow"), "key")


def sql_shard_assignments() -> str:
    from ..stages.sharding import sql_assign_shards

    return sql_assign_shards("CAST(doc_id AS VARCHAR)", "documents")


def q_source_mixture_sample(sf_dir: str):
    """Deterministic source-mixture subsample (LLM data mixing): per-source
    hash-derived keep rates, pure per-batch filter."""
    from ..stages.topk import mixture_sample

    ds = _docs(sf_dir, columns=["doc_id", "source"])
    return mixture_sample(ds, "source", "doc_id")


def q_token_count_ranks(sf_dir: str):
    """Exact global RANK() over token counts WITHOUT a global sort: value
    histogram (shuffle bounded by distinct-count) broadcast as a cumulative
    array, ranks assigned per batch by searchsorted."""
    from ..stages.rank import global_rank

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_token_count, batch_format="pyarrow")
    ds = global_rank(ds, "n_tokens", out_col="rnk")
    return ds.select_columns(["doc_id", "n_tokens", "rnk"])


def q_top_customers(sf_dir: str, k: int = 10):
    """Sort + limit over a grouped aggregate: top-k customers by total
    order value (rounded to cents so the float sum compares exactly)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    agg = ds.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent"), Count(alias_name="n_orders")
    )

    def to_cents(b: pa.Table) -> pa.Table:
        # integer cents: bit-exact across engines (see revenue_by_returnflag)
        i = b.column_names.index("total_spent")
        v = pc.round(pc.multiply(b.column("total_spent"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        return b.set_column(i, "total_spent_cents", v)

    agg = agg.map_batches(to_cents, batch_format="pyarrow")
    return agg.sort(["total_spent_cents", "o_custkey"], descending=[True, False]).limit(k)


def q_parts_by_type(sf_dir: str):
    """Broadcast join (part dim shipped once via ray.put) + grouped agg:
    lineitem quantity totals per part type."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    # broadcast the dim as Arrow arrays; per-batch lookup is vectorized
    # index_in + take (dictionary-style gather), no Python row loop
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    ref = ray.put(
        (part.column("p_partkey").combine_chunks(), part.column("p_type").combine_chunks())
    )

    class AddType:
        def __init__(self, ref):
            self.keys, self.types = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            col = b.column("l_partkey")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            idx = pc.index_in(col, value_set=self.keys)
            return b.append_column("p_type", self.types.take(idx))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey", "l_quantity"]
    )
    from ..stages.taskstate import task_stage

    ds = ds.map_batches(task_stage(AddType, ref=ref), batch_format="pyarrow")
    return ds.groupby("p_type").aggregate(
        Sum("l_quantity", alias_name="sum_qty"), Count(alias_name="n_items")
    )


def q_props_key_counts(sf_dir: str):
    """Semi-structured parsing: extract the integer ``k`` from the JSON
    ``props`` column (vectorized regex) -> histogram."""
    from ray.data.aggregate import Count

    ds = _events(sf_dir, columns=["props"])

    def extract(b: pa.Table) -> pa.Table:
        col = b.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = pc.extract_regex(col, r'"k": (?P<v>\d+)')
        v = pc.struct_field(m, "v").cast(pa.int64())
        return pa.Table.from_pydict({"k_value": v})

    ds = ds.map_batches(extract, batch_format="pyarrow")
    return ds.groupby("k_value").aggregate(Count(alias_name="n_events"))


def _events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def q_events_window(sf_dir: str):
    """Tumbling 1-hour event-time window aggregate."""
    from ..stages.events import window_counts

    return window_counts(_events(sf_dir, columns=["ts", "event_type", "value"]))


def q_events_sliding_window(sf_dir: str):
    """Sliding event-time windows (1 h size, 15 min slide)."""
    from ..stages.events import sliding_window_counts

    return sliding_window_counts(_events(sf_dir, columns=["ts", "event_type", "value"]))


def q_sessionize(sf_dir: str):
    """Gap-based per-user sessionization (30-min inactivity gap)."""
    from ..stages.events import sessionize

    return sessionize(_events(sf_dir, columns=["event_id", "ts", "user_id"]))


def q_user_event_stats(sf_dir: str):
    """Per-user event stats (count, sum, error count)."""
    from ..stages.events import user_stats

    return user_stats(_events(sf_dir, columns=["user_id", "event_type", "value"]))


def q_event_intervals(sf_dir: str):
    """Gaps-and-islands interval coalescing: value-weighted event intervals
    merged per user into maximal validity islands (stages/events
    .coalesce_intervals — one user_id shuffle, vectorized running-max
    recurrence)."""
    from ..stages.events import coalesce_intervals

    return coalesce_intervals(
        _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])
    )


def q_session_island_overlap(sf_dir: str):
    """Interval-overlap JOIN with both sides large: per-user observation
    sessions (gap sessionization) x per-user fact-validity islands
    (gaps-and-islands coalescing), matched on temporal overlap via the
    day-bucket decomposition join (stages/intervaljoin.py — pairs kept
    exactly once in their first shared bucket, no dedup shuffle).
    Sessions are closed at their last event instant -> half-open as
    [start, end+1)."""
    from ..stages.events import coalesce_intervals, sessionize
    from ..stages.intervaljoin import interval_overlap_join

    sessions = sessionize(_events(sf_dir, columns=["event_id", "ts", "user_id"]))

    def half_open(b: pa.Table) -> pa.Table:
        e = pc.add(b.column("end_us"), pa.scalar(1, type=pa.int64()))
        return b.set_column(b.column_names.index("end_us"), "end_us", e)

    sessions = sessions.map_batches(half_open, batch_format="pyarrow")
    islands = coalesce_intervals(
        _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])
    )
    return interval_overlap_join(
        sessions,
        islands,
        key_col="user_id",
        left_cols=("session_id", "start_us", "end_us"),
        right_cols=("island_id", "start_us", "end_us"),
    )


def sql_session_island_overlap() -> str:
    from ..stages.events import sql_coalesce_intervals, sql_sessionize

    return (
        f"WITH sess AS ({sql_sessionize()}),\n"
        f"isl AS ({sql_coalesce_intervals()})\n"
        f"SELECT s.user_id, s.session_id, i.island_id,\n"
        f"  least(s.end_us + 1, i.end_us) - greatest(s.start_us, i.start_us)\n"
        f"    AS overlap_us\n"
        f"FROM sess s JOIN isl i ON s.user_id = i.user_id\n"
        f"  AND greatest(s.start_us, i.start_us) < least(s.end_us + 1, i.end_us)"
    )


def q_order_skyline(sf_dir: str):
    """2-D skyline / Pareto frontier: orders not dominated on
    (total price, order recency) — multi-criteria selection via the
    lossless local-skyline combiner (stages/skyline.py); only
    frontier-sized partials ever move."""
    import ray.data as rd

    from ..stages.skyline import skyline_2d

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )

    def prep(b: pa.Table) -> pa.Table:
        price_c = pc.round(pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        day = pc.divide(
            pc.cast(b.column("o_orderdate").combine_chunks(), pa.int64()),
            pa.scalar(86_400_000_000, type=pa.int64()),
        )
        return pa.Table.from_pydict(
            {"o_orderkey": b.column("o_orderkey"), "price_c": price_c, "day": day}
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    return skyline_2d(ds, "price_c", "day")


def sql_order_skyline() -> str:
    return (
        "WITH t AS (\n"
        "  SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c,\n"
        "    epoch_us(o_orderdate) // 86400000000 AS day\n"
        "  FROM orders)\n"
        "SELECT o_orderkey, price_c, day FROM t a\n"
        "WHERE NOT EXISTS (SELECT 1 FROM t b\n"
        "  WHERE b.price_c >= a.price_c AND b.day >= a.day\n"
        "    AND (b.price_c > a.price_c OR b.day > a.day))"
    )


def q_event_decay_scores(sf_dir: str):
    """Per-event exponential-decay activity score (alpha=1/2 EWMA over
    value cents, exact integer recurrence s_i = (v_i + s_{i-1}) // 2 in
    per-user event-time order) — the feature-engineering recurrence a
    recommender/abuse pipeline computes per user. Oracle: recursive CTE
    stepping the identical integer rule."""
    from ..stages.events import decay_scores

    return decay_scores(
        _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])
    )


def q_top_orders_per_priority(sf_dir: str, k: int = 3):
    """Grouped top-k with a partial combiner (stages/topk.py): top-k orders
    per priority class by total price."""
    import ray.data as rd

    from ..stages.topk import grouped_topk

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
    )
    out = grouped_topk(
        ds, "o_orderpriority", ["o_totalprice", "o_orderkey"], k, descending=True
    )
    return out.select_columns(["o_orderpriority", "o_orderkey", "o_totalprice"])


def q_stratified_sample(sf_dir: str, k: int = 20):
    """Deterministic k-per-language document sample by md5 hash rank."""
    from ..stages.topk import stratified_sample

    ds = _docs(sf_dir, columns=["lang", "doc_id"])
    return stratified_sample(ds, "lang", "doc_id", k).select_columns(
        ["lang", "doc_id"]
    )


def q_doc_chunks(sf_dir: str, size: int = 200, overlap: int = 40):
    """Fixed-size character chunking with overlap (training-data prep)."""
    from ..stages.chunking import chunk_documents

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return chunk_documents(ds, size=size, overlap=overlap)


def q_vocab_df(sf_dir: str):
    """Corpus vocabulary doc/term frequencies (partial-combiner shuffle)."""
    from ..stages.text_analysis import vocab_df

    return vocab_df(_docs(sf_dir, columns=["doc_id", "text"]))


def q_heavy_hitters(sf_dir: str):
    """Exact heavy-hitter tokens (freq > n/(k+1)) via a two-pass
    Misra-Gries sweep — candidate combiner bounded at k rows/batch, exact
    recount of the broadcast candidate set; the vocab never shuffles."""
    from ..stages.sketch import heavy_hitter_tokens

    return heavy_hitter_tokens(_docs(sf_dir, columns=["doc_id", "text"]))


def q_redact_pii(sf_dir: str):
    """PII scrubbing: emails/phones/long digit runs -> typed placeholders."""
    from ..stages.text_analysis import redact_pii

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(redact_pii, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "clean_text"])


def q_doc_keywords(sf_dir: str, k: int = 3):
    """Top-k characteristic words per doc (tf/df weighting, exact-rational
    so the oracle hash-matches)."""
    from ..stages.text_analysis import doc_keywords

    return doc_keywords(_docs(sf_dir, columns=["doc_id", "text"]), k=k)


def q_packed_sequences(sf_dir: str, max_len: int = 100):
    """Doc-local greedy sequence packing over whitespace tokens
    (stages/packing pack_doc_parts — graduated from rows-only in round
    5): sequences never span documents, so the output is identical at
    any parallelism or dynamic block split, and the data-dependent
    greedy fold (variable token lengths) is VALUE-EXACT against a
    recursive-CTE DuckDB oracle carrying the running fill. One
    zero-shuffle pass; the scan loop runs once per output sequence. The
    block-local chunk packer (pack_sequences) remains the cross-doc
    throughput path, pinned by tests/test_packing.py property tests."""
    from ..stages.packing import pack_doc_parts

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return pack_doc_parts(ds, max_len=max_len)


def q_events_last_order(sf_dir: str):
    """As-of join: each event attached to the user's most recent order at
    event time (one hash shuffle on the user key, vectorized sorted-merge
    per group — stages/asof.py)."""
    import ray.data as rd

    from ..stages.asof import asof_last_order

    events = _events(sf_dir, columns=["event_id", "ts", "user_id"])
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    return asof_last_order(events, orders)


def q_corpus_prep_full(sf_dir: str):
    """Extended corpus-prep chain (redaction, repetition filter, quality)."""
    from .prep import corpus_prep_full

    return corpus_prep_full(sf_dir)


def q_top_bigrams(sf_dir: str, k: int = 20):
    """Corpus-wide top-k word bigrams (combiner → sum → tiny sort+limit)."""
    from ..stages.text_analysis import top_bigrams

    return top_bigrams(_docs(sf_dir, columns=["text"]), k=k)


def q_compression_ratio(sf_dir: str):
    """Deflate-ratio quality signal per doc (rows-only: no SQL compress)."""
    from ..stages.text_analysis import add_compression_ratio

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_compression_ratio, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_bytes", "n_deflate", "compression_ratio"])


def q_repetition_stats(sf_dir: str):
    """Duplicate-line repetition signal (quality filter input)."""
    from ..stages.text_analysis import add_repetition_stats

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_repetition_stats, batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "n_lines", "n_distinct_lines", "dup_line_frac"]
    )


def q_exact_substring_dedup(sf_dir: str):
    """ExactSubstr dedup: remove every 8-word span occurring more than
    once corpus-wide (stages/dedup_substr.py; shingle-count combiner,
    semi-join mark, anti-join removal, per-doc reassembly)."""
    from ..stages.dedup_substr import exact_substring_dedup

    return exact_substring_dedup(_docs(sf_dir, columns=["doc_id", "text"]))


def q_line_dedup_docs(sf_dir: str):
    """Corpus-level duplicate-line removal (CCNet prep step). The synthetic
    docs are single-line, so lines are derived deterministically by
    splitting at the literal token ' the ' (same derivation in the SQL
    oracle) — near-duplicate docs share long word runs, so real cross-doc
    duplicate lines exist and are dropped. Two combiner-bounded shuffles:
    groupby(line) keeper-min, groupby(doc_id) reassembly."""
    import pyarrow.compute as pc

    from ..stages.text_analysis import line_dedup

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def to_lines(b):
        return b.set_column(
            b.schema.get_field_index("text"),
            "text",
            pc.replace_substring(b.column("text"), " the ", "\n"),
        )

    return line_dedup(ds.map_batches(to_lines, batch_format="pyarrow"))


def q_event_value_quantiles(sf_dir: str):
    """Per-event-type exact discrete quantiles of the value column."""
    from ..stages.events import grouped_quantiles

    return grouped_quantiles(
        _events(sf_dir, columns=["event_type", "value"]), "event_type", "value"
    )


def q_event_value_quantiles_cont(sf_dir: str):
    """Per-event-type INTERPOLATED quantiles (percentile_cont semantics,
    bit-exact replica of DuckDB's lerp — see grouped_quantiles_cont)."""
    from ..stages.events import grouped_quantiles_cont

    return grouped_quantiles_cont(
        _events(sf_dir, columns=["event_type", "value"]), "event_type", "value"
    )


def q_supplier_balance_outliers(sf_dir: str):
    """Robust outlier gating (data-cleaning composition): suppliers whose
    account balance sits more than 3 MADs from their nation's median.
    One groupby(nation).map_groups computes median, MAD and the filter in
    a single pass — no join back. The predicate runs on raw float64 with
    the same bit-exact median/mad as event_value_mad, so the oracle's
    filter set is identical."""
    import ray.data as rd

    from ..stages.events import lerp_median

    ds = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
    )

    def per_group(g: pa.Table) -> pa.Table:
        bal = g.column("s_acctbal").to_numpy(zero_copy_only=False)
        med = lerp_median(np.sort(bal))
        mad = lerp_median(np.sort(np.abs(bal - med)))
        keep = np.abs(bal - med) > 3.0 * mad
        cents = np.round(bal[keep] * 100.0).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "s_suppkey": g.column("s_suppkey").filter(pa.array(keep)),
                "s_nationkey": g.column("s_nationkey").filter(pa.array(keep)),
                "bal_cents": pa.array(cents, type=pa.int64()),
            }
        )

    out = ds.groupby("s_nationkey").map_groups(per_group, batch_format="pyarrow")
    # the outlier set is supplier-dim-bounded; collect through the shared
    # guard so an all-empty result keeps its schema (map_groups can emit
    # schema-less empty blocks)
    from ..stages.collect import collect_blocks

    return collect_blocks(
        out,
        "s_suppkey",
        pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_nationkey": pa.array([], type=pa.int32()),
                "bal_cents": pa.array([], type=pa.int64()),
            }
        ),
    )


def sql_supplier_balance_outliers() -> str:
    return (
        "SELECT s_suppkey, s_nationkey,\n"
        "  CAST(round(s_acctbal*100) AS BIGINT) AS bal_cents\n"
        "FROM supplier JOIN (SELECT s_nationkey AS nk, median(s_acctbal) AS med,\n"
        "    mad(s_acctbal) AS m FROM supplier GROUP BY nk) stats\n"
        "  ON s_nationkey = nk\n"
        "WHERE abs(s_acctbal - med) > 3.0 * m"
    )


def q_latest_order(sf_dir: str):
    """FIRST_VALUE / QUALIFY row_number()=1 shape: each customer's most
    recent order (date desc, orderkey desc tiebreak) — grouped top-1 via
    the per-batch argmax combiner (shuffle bounded by keys x batches)."""
    import ray.data as rd

    from ..stages.topk import grouped_topk

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def pre(b: pa.Table) -> pa.Table:
        us = b.column("o_orderdate").combine_chunks().cast(pa.int64())
        return pa.Table.from_pydict(
            {
                "o_custkey": b.column("o_custkey"),
                "o_orderkey": b.column("o_orderkey"),
                "latest_us": us,
                "latest_priority": b.column("o_orderpriority"),
            }
        )

    ds = ds.map_batches(pre, batch_format="pyarrow")
    return grouped_topk(
        ds, "o_custkey", ["latest_us", "o_orderkey"], 1, descending=[True, True]
    )


def sql_latest_order() -> str:
    return (
        "SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS latest_us,\n"
        "  o_orderpriority AS latest_priority\n"
        "FROM orders QUALIFY row_number() OVER (PARTITION BY o_custkey\n"
        "  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1"
    )


def q_event_value_mad(sf_dir: str):
    """Per-event-type median + median absolute deviation (robust outlier
    scale), bit-exact vs DuckDB median/mad."""
    from ..stages.events import grouped_mad

    return grouped_mad(
        _events(sf_dir, columns=["event_type", "value"]), "event_type", "value"
    )


def q_lang_id(sf_dir: str):
    """Stopword-heuristic language ID (actor-pool stage, oracle-checked)."""
    from ..stages.text_analysis import LangIdStage

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    from ..stages.taskstate import task_stage

    ds = ds.map_batches(task_stage(LangIdStage), batch_format="pyarrow")
    return ds.select_columns(["doc_id", "lang_pred"])


def q_retention_cohorts(sf_dir: str):
    """Cohort retention grid: distinct users per (first-seen day, activity
    day offset) — stages/events.retention_cohorts (distinct-days dedup ->
    per-user min -> one hash join -> dimension-bounded final groupby)."""
    from ..stages.events import retention_cohorts

    return retention_cohorts(_events(sf_dir, columns=["ts", "user_id"]))


NOVELTY_SNAPS = 8


def q_shingle_novelty(sf_dir: str):
    """Crawl-freshness metric: NEW distinct word-shingles contributed by
    each crawl snapshot (doc_id%8 snapshots, as in entity_timeline) —
    shingle -> min-snapshot aggregate on the uniform 64-bit hash key, then
    a snapshot-bounded count. The curve a crawl scheduler reads to decide
    when re-crawling stops paying."""
    from ray.data.aggregate import Count, Min

    from ..stages.dedup_approx import _shingle_rows

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        p, h, _ = _shingle_rows(b.column("text"))
        ids = b.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        snap = pc.bit_wise_and(
            ids.take(pa.array(p)), pa.scalar(NOVELTY_SNAPS - 1, type=pa.int64())
        )
        t = pa.table({"h": pa.array(h.view(np.int64)), "snap": snap})
        # per-batch (h, snap) dedup combiner bounds the shuffle
        arr = np.stack(
            [t.column("h").to_numpy(zero_copy_only=False),
             t.column("snap").to_numpy(zero_copy_only=False)], axis=1
        )
        uniq = np.unique(arr, axis=0)
        return pa.table(
            {"h": pa.array(uniq[:, 0], type=pa.int64()),
             "snap": pa.array(uniq[:, 1], type=pa.int64())}
        )

    first = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("snap", alias_name="first_snap"))
    )
    return first.groupby("first_snap").aggregate(
        Count(alias_name="n_new_shingles")
    )


def sql_shingle_novelty() -> str:
    from ..stages.dedup_approx import sql_shingle_ctes

    return (
        f"WITH {sql_shingle_ctes()},\n"
        f"s AS (SELECT doc_id % {NOVELTY_SNAPS} AS snap, h64 FROM hsh),\n"
        f"f AS (SELECT h64, min(snap) AS first_snap FROM s GROUP BY h64)\n"
        f"SELECT first_snap, CAST(count(*) AS BIGINT) AS n_new_shingles\n"
        f"FROM f GROUP BY first_snap"
    )


def q_lang_confusion(sf_dir: str):
    """Language-metadata audit: confusion matrix of declared ``lang`` vs
    detected ``lang_pred`` (the mislabeled-document report a curation run
    reads before trusting crawl metadata). One dimension-bounded groupby
    over the actor-pool lang-ID pass."""
    from ray.data.aggregate import Count

    from ..stages.taskstate import task_stage
    from ..stages.text_analysis import LangIdStage

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(task_stage(LangIdStage), batch_format="pyarrow")
    return ds.select_columns(["lang", "lang_pred"]).groupby(
        ["lang", "lang_pred"]
    ).aggregate(Count(alias_name="n_docs"))


def sql_lang_confusion() -> str:
    from ..stages.text_analysis import sql_lang_id

    return (
        f"WITH p AS ({sql_lang_id()})\n"
        f"SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs\n"
        f"FROM documents d JOIN p ON p.doc_id = d.doc_id\n"
        f"GROUP BY d.lang, p.lang_pred"
    )


def _media_path(sf_dir: str) -> str:
    """Synth media parquet cache, keyed on the SOURCE's identity: the cache
    name embeds a fingerprint of documents.parquet's path + size + mtime,
    so regenerated testdata (or two corpora sharing a basename) can never
    serve stale media rows while the SQL oracle recomputes from the new
    table. (The old basename-only key needed a manual "-v2" bump once —
    exactly this staleness.)"""
    import hashlib

    from ..stages.multimodal import synth_media_for_documents

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{os.path.realpath(src)}:{st.st_size}:{st.st_mtime_ns}:v2".encode()
    ).hexdigest()[:12]
    media_path = os.path.join(
        "/tmp/quickner_media",
        f"{os.path.basename(os.path.normpath(sf_dir))}-{fp}.parquet",
    )
    if not os.path.exists(media_path):
        os.makedirs(os.path.dirname(media_path), exist_ok=True)
        synth_media_for_documents(src, media_path)
    return media_path


def q_audio_features(sf_dir: str):
    """Audio decode plumbing: QAUD payloads -> duration/peak/sum features
    (actor-pool stage; oracle recomputes the closed-form samples)."""
    import ray.data as rd

    from ..stages.multimodal import audio_features

    ds = rd.read_parquet(_media_path(sf_dir))
    ds = ds.filter(expr="media_type == 'audio'")
    ds = audio_features(ds, batch_size=256)
    return ds.select_columns(["media_id", "duration_ms", "peak_amp", "sum_amp"])


def q_audio_segments(sf_dir: str):
    """VAD-style loud-segment detection: per audio payload, loud sample
    count, contiguous-segment count, and longest run."""
    import ray.data as rd

    from ..stages.multimodal import audio_segments

    ds = rd.read_parquet(_media_path(sf_dir))
    ds = ds.filter(expr="media_type == 'audio'")
    ds = audio_segments(ds, batch_size=256)
    return ds.select_columns(["media_id", "n_loud", "n_segments", "longest_run"])


def q_media_features(sf_dir: str):
    """Multimodal plumbing: deterministic synthetic image payloads (binary
    column derived from documents) -> actor-pool decode -> feature columns.
    The oracle recomputes the features straight from the source table."""
    import ray.data as rd

    from ..stages.multimodal import decode_images, synth_media_for_documents

    media_path = _media_path(sf_dir)
    ds = rd.read_parquet(media_path)
    ds = ds.filter(expr="media_type == 'image'")
    ds = decode_images(ds, batch_size=256)
    return ds.select_columns(["media_id", "width", "height", "channels", "n_bytes"])


def q_media_embeddings(sf_dir: str):
    """Embedding extraction from media payloads (CLIP-at-scale plumbing):
    actor-pool decode + position-bucketed integer pixel pooling, exploded
    to (media_id, dim, value) rows; zero shuffles. A learned encoder slots
    into the same stage unchanged."""
    import ray.data as rd

    from ..stages.multimodal import embed_images

    ds = rd.read_parquet(_media_path(sf_dir))
    ds = ds.filter(expr="media_type == 'image'")
    return embed_images(ds, batch_size=256)


def q_frame_sample(sf_dir: str):
    """Video frame sampling plumbing (explode to one row per sampled frame)."""
    import ray.data as rd

    from ..stages.multimodal import sample_frames, synth_media_for_documents

    media_path = _media_path(sf_dir)
    ds = rd.read_parquet(media_path)
    ds = ds.filter(expr="media_type == 'video'")
    return sample_frames(ds, step=5, batch_size=256)


# ---- rows-only (non-SQL-expressible: full boundary-rule NER) ----------------

def q_similarity_topk_ivf(sf_dir: str, k: int = 10, query_id: int = 0):
    """IVF approximate top-k (cluster-partitioned index, nprobe pruning).
    Rows-only: recall < 1 by construction (tests pin recall >= 0.9)."""
    from ..stages.similarity import ivf_topk

    return ivf_topk(
        os.path.join(sf_dir, "embeddings.parquet"), query_id, k, n_clusters=16, nprobe=8
    )


def q_similarity_topk_ivfpq_seeded(sf_dir: str):
    """Seeded-config composed IVF-PQ (stages/ivfpq.py seeded arm): the
    probe set, centroids, codebooks and ADC LUTs are pure functions of
    fixed seeds, every coefficient inlines into the DuckDB oracle as repr
    literals, and both engines accumulate floats in dimension order — the
    full routing + residual-encode + ADC pipeline verified VALUE-EXACT
    (the trained arm stays the quality path, recall-pinned in tests)."""
    from ..stages.ivfpq import ivfpq_topk_seeded

    return ivfpq_topk_seeded(os.path.join(sf_dir, "embeddings.parquet"))


def sql_similarity_topk_ivfpq_seeded() -> str:
    from ..stages.ivfpq import sql_ivfpq_seeded

    return sql_ivfpq_seeded()


def q_similarity_topk_ivfpq(sf_dir: str, k: int = 10, query_id: int = 0):
    """Composed IVF-PQ top-k (stages/ivfpq.py): IVF centroids route the
    read to nprobe cluster partitions; each partition holds only uint8 PQ
    residual codes (m bytes/vector residency) scanned via per-cluster ADC
    look-up tables — the billion-vector serving structure. Rows-only:
    doubly approximate by construction (tests pin recall >= 0.9 and the
    m-bytes-per-vector payload)."""
    from ..stages.ivfpq import ivfpq_topk

    return ivfpq_topk(
        os.path.join(sf_dir, "embeddings.parquet"),
        query_id,
        k,
        n_clusters=16,
        nprobe=8,
        pq_m=8,
        pq_ks=16,
    )


def q_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (rolling-hash minima); rows-only."""
    from ..stages.text_analysis import add_fingerprint

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fingerprint"])


def q_entity_link(sf_dir: str):
    """Entity-link candidate scoring over the mention stream. Detection runs
    ONCE: the mention stream (with doc context attached) is materialized in
    the object store and reused for both the candidate source (the canonical
    entity table — bounded by the gazetteer, collected driver-side) and the
    link pass, so context scoring is exercised end-to-end."""
    from ..stages.entity_link import link_mentions

    m = mentions_dataset(sf_dir, keep_text=True).materialize()
    ents = canonical_entities(m).take_all()
    entities = [(r["surface_norm"], r["label"], float(r["n_mentions"])) for r in ents]
    linked = link_mentions(m, entities, text_col="doc_text")
    return linked.select_columns(
        ["doc_id", "surface_norm", "label", "linked_entity_id", "link_score", "n_candidates"]
    )


RICH_BAL = 900_000  # cents


def q_nation_rich_counts(sf_dir: str):
    """FULL OUTER shuffle join with genuine null sides: per-nation counts of
    high-balance customers vs high-balance suppliers (each side filtered so
    some nations appear on only one side). Nulls coalesce to 0 so the
    column stays int64 on both engines."""
    import ray.data as rd
    from ray.data.aggregate import Count

    def big_side(table: str, key: str, bal: str, out: str):
        ds = rd.read_parquet(
            os.path.join(sf_dir, f"{table}.parquet"), columns=[key, bal]
        )

        def f(b: pa.Table) -> pa.Table:
            cents = pc.round(pc.multiply(b.column(bal), pa.scalar(100.0))).cast(
                pa.int64()
            )
            keep = pc.greater(cents, pa.scalar(RICH_BAL, type=pa.int64()))
            return pa.Table.from_pydict(
                {"nationkey": b.column(key).filter(keep).cast(pa.int64())}
            )

        return (
            ds.map_batches(f, batch_format="pyarrow")
            .groupby("nationkey")
            .aggregate(Count(alias_name=out))
        )

    cust = big_side("customer", "c_nationkey", "c_acctbal", "n_rich_cust")
    supp = big_side("supplier", "s_nationkey", "s_acctbal", "n_rich_supp")
    # bucketed full outer (stages/hashjoin.py): with explicit types a side
    # that filters COMPLETELY empty at tiny sf still joins correctly —
    # Ray's Dataset.join crashed on the schema-less empty side (KeyError
    # on the right key) because no block carried the schema
    from ..stages.hashjoin import bucketed_join

    joined = bucketed_join(
        cust,
        supp,
        on=("nationkey",),
        n_buckets=4,
        join_type="full outer",
        left_types={"nationkey": pa.int64(), "n_rich_cust": pa.int64()},
        right_types={"nationkey": pa.int64(), "n_rich_supp": pa.int64()},
    )

    def finish(b: pa.Table) -> pa.Table:
        # acero full outer coalesces the key columns into one
        nk = b.column("nationkey").combine_chunks().cast(pa.int64())
        zero = pa.scalar(0, type=pa.int64())
        return pa.Table.from_pydict(
            {
                "nationkey": nk,
                "n_rich_cust": pc.coalesce(
                    b.column("n_rich_cust").combine_chunks().cast(pa.int64()), zero
                ),
                "n_rich_supp": pc.coalesce(
                    b.column("n_rich_supp").combine_chunks().cast(pa.int64()), zero
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def sql_nation_rich_counts() -> str:
    return (
        f"WITH c AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n\n"
        f"  FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > {RICH_BAL}\n"
        f"  GROUP BY c_nationkey),\n"
        f"s AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n\n"
        f"  FROM supplier WHERE CAST(round(s_acctbal*100) AS BIGINT) > {RICH_BAL}\n"
        f"  GROUP BY s_nationkey)\n"
        f"SELECT coalesce(c.nk, s.nk) AS nationkey,\n"
        f"  coalesce(c.n, 0) AS n_rich_cust,\n"
        f"  coalesce(s.n, 0) AS n_rich_supp\n"
        f"FROM c FULL OUTER JOIN s ON c.nk = s.nk"
    )


def q_nation_customer_list(sf_dir: str):
    """Grouped ordered string aggregation (LISTAGG/string_agg shape): the
    names of each nation's top-3 customers by balance, comma-joined in
    (balance DESC, custkey ASC) order. Per-group vectorized: sort indices +
    one binary_join_element_wise per group row."""
    import ray.data as rd

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_name", "c_acctbal"],
    )

    def agg_group(g: pa.Table) -> pa.Table:
        cents = (
            pc.round(pc.multiply(g.column("c_acctbal"), pa.scalar(100.0)))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        key = g.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((key, -cents))[:3]
        names = g.column("c_name").take(pa.array(order)).to_pylist()
        return pa.Table.from_pydict(
            {
                "c_nationkey": g.column("c_nationkey").slice(0, 1),
                "top_names": pa.array([",".join(names)], type=pa.string()),
            }
        )

    return cust.groupby("c_nationkey").map_groups(agg_group, batch_format="pyarrow")


def sql_nation_customer_list() -> str:
    return (
        "SELECT c_nationkey, string_agg(c_name, ',' ORDER BY\n"
        "    CAST(round(c_acctbal*100) AS BIGINT) DESC, c_custkey) AS top_names\n"
        "FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey\n"
        "        ORDER BY CAST(round(c_acctbal*100) AS BIGINT) DESC, c_custkey)\n"
        "        AS rn FROM customer)\n"
        "WHERE rn <= 3 GROUP BY c_nationkey"
    )


Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1998-01-01"


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H-Q5-shaped 5-way join: revenue per nation from lineitems where
    supplier and customer share the nation, restricted to one region and a
    date range. Join plan: the single all-to-all is lineitem ⋈ orders on
    orderkey (both fact-sized). supplier and customer nation keys attach as
    BROADCAST Arrow lookups (supplier is a dim; customer's (custkey ->
    nationkey) projection is the one fact-sized broadcast — documented
    tradeoff, the partitioned alternative is a second orderkey-co-shuffle
    as in shipping_priority). nation/region fold into one nationkey ->
    name map applied batch-side; the n_nation == c_nation equality is a
    vectorized filter, never a join."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo_us = int(pa.scalar(Q5_FROM).cast(pa.timestamp("us")).cast(pa.int64()).as_py())
    hi_us = int(pa.scalar(Q5_TO).cast(pa.timestamp("us")).cast(pa.int64()).as_py())

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    rkey = region.filter(pc.equal(region.column("r_name"), Q5_REGION)).column(
        "r_regionkey"
    )[0]
    nat = nation.filter(pc.equal(nation.column("n_regionkey"), rkey))
    nat_keys = nat.column("n_nationkey").combine_chunks()
    nat_names = nat.column("n_name").combine_chunks()

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    ref = ray.put(
        (
            supp.column("s_suppkey").combine_chunks(),
            supp.column("s_nationkey").combine_chunks(),
            cust.column("c_custkey").combine_chunks(),
            cust.column("c_nationkey").combine_chunks(),
            nat_keys,
            nat_names,
        )
    )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def orders_pre(b: pa.Table) -> pa.Table:
        us = b.column("o_orderdate").combine_chunks().cast(pa.int64())
        keep = pc.and_(
            pc.greater_equal(us, pa.scalar(lo_us, type=pa.int64())),
            pc.less(us, pa.scalar(hi_us, type=pa.int64())),
        )
        return pa.Table.from_pydict(
            {
                "o_orderkey": b.column("o_orderkey").filter(keep),
                "o_custkey": b.column("o_custkey").filter(keep),
            }
        )

    orders = orders.map_batches(orders_pre, batch_format="pyarrow")

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_pre(b: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(b.column("l_extendedprice"), pa.scalar(100.0))).cast(pa.int64())
        disc = pc.round(pc.multiply(b.column("l_discount"), pa.scalar(100.0))).cast(pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, type=pa.int64()), disc))
        return pa.Table.from_pydict(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "revenue_e4": rev,
            }
        )

    li = li.map_batches(li_pre, batch_format="pyarrow")
    joined = li.join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    class Finish:
        def __init__(self):
            sk, sn, ck, cn, nk, nn = ray.get(ref)
            self.sk, self.sn, self.ck, self.cn = sk, sn, ck, cn
            self.nk, self.nn = nk, nn

        def __call__(self, b: pa.Table) -> pa.Table:
            s_nat = self.sn.take(pc.index_in(b.column("l_suppkey"), value_set=self.sk))
            c_nat = self.cn.take(pc.index_in(b.column("o_custkey"), value_set=self.ck))
            idx = pc.index_in(s_nat, value_set=self.nk)
            keep = pc.and_(
                pc.equal(s_nat, c_nat).combine_chunks(), pc.is_valid(idx)
            )
            name = self.nn.take(idx.filter(keep))
            return pa.Table.from_pydict(
                {
                    "n_name": name,
                    "revenue_e4": b.column("revenue_e4").filter(keep),
                }
            )

    out = joined.map_batches(Finish, batch_format="pyarrow", concurrency=4)
    agg = out.groupby("n_name").aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    return agg


def sql_local_supplier_revenue() -> str:
    return (
        f"SELECT n_name,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)\n"
        f"    AS revenue_e4\n"
        f"FROM customer, orders, lineitem, supplier, nation, region\n"
        f"WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey\n"
        f"  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey\n"
        f"  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey\n"
        f"  AND r_name = '{Q5_REGION}'\n"
        f"  AND o_orderdate >= TIMESTAMP '{Q5_FROM}'\n"
        f"  AND o_orderdate < TIMESTAMP '{Q5_TO}'\n"
        f"GROUP BY n_name"
    )


def q_customer_cumulative_spend(sf_dir: str):
    """Cumulative SUM window frame with EXACT arithmetic: running total of
    order price (cents, int64) per customer in (o_orderdate, o_orderkey)
    order — the running-aggregate shape running_extrema deliberately
    avoided for doubles is exact here because the money grid is integral."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def cum_group(g: pa.Table) -> pa.Table:
        date = g.column("o_orderdate").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        okey = g.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = (
            pc.round(pc.multiply(g.column("o_totalprice"), pa.scalar(100.0)))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((okey, date))
        cum = np.cumsum(cents[order])
        cust = g.column("o_custkey")[0].as_py()
        n = len(okey)
        return pa.Table.from_pydict(
            {
                "o_custkey": pa.array(np.full(n, cust), type=pa.int64()),
                "o_orderkey": pa.array(okey[order]),
                "cum_spend_cents": pa.array(cum.astype(np.int64)),
            }
        )

    return ds.groupby("o_custkey").map_groups(cum_group, batch_format="pyarrow")


def sql_customer_cumulative_spend() -> str:
    return (
        "SELECT o_custkey, o_orderkey,\n"
        "  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER w AS BIGINT)\n"
        "    AS cum_spend_cents\n"
        "FROM orders\n"
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey\n"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )


HIST_BINS = 20


def q_order_price_histogram(sf_dir: str):
    """Equal-width histogram over order price: pass 1 computes global
    min/max cents (tiny aggregate, broadcast); pass 2 bins each row with
    integer arithmetic and counts per bin. The bin rule (value==max goes to
    the last bin) is mirrored exactly in SQL."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    path = os.path.join(sf_dir, "orders.parquet")

    def cents_tbl(b: pa.Table) -> pa.Table:
        c = pc.round(pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        return pa.Table.from_pydict({"cents": c})

    ds = rd.read_parquet(path, columns=["o_totalprice"]).map_batches(
        cents_tbl, batch_format="pyarrow"
    )
    bounds = ds.aggregate(Min("cents"), Max("cents"))
    lo, hi = int(bounds["min(cents)"]), int(bounds["max(cents)"])
    span = max(hi - lo, 1)

    def bin_rows(b: pa.Table) -> pa.Table:
        c = b.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
        # bin = floor((c-lo)*BINS/span), max value clamped into the last bin
        bins = np.minimum((c - lo) * HIST_BINS // span, HIST_BINS - 1)
        return pa.Table.from_pydict({"bin": pa.array(bins)})

    return (
        ds.map_batches(bin_rows, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(alias_name="n_orders"))
    )


def sql_order_price_histogram() -> str:
    return (
        f"WITH c AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents\n"
        f"  FROM orders),\n"
        f"b AS (SELECT min(cents) AS lo,\n"
        f"  greatest(max(cents) - min(cents), 1) AS span FROM c)\n"
        f"SELECT least((cents - lo) * {HIST_BINS} // span, {HIST_BINS - 1})"
        f" AS bin,\n"
        f"  CAST(count(*) AS BIGINT) AS n_orders\n"
        f"FROM c, b GROUP BY bin"
    )


def q_user_event_unpivot(sf_dir: str):
    """UNPIVOT / melt: the fixed-width per-user pivot (one column per event
    type) melted back to long form — one vectorized column-stack per batch,
    zero rows move between workers. Zero counts survive the melt (that is
    what distinguishes it from the plain groupby)."""
    pivot = q_user_event_pivot(sf_dir)

    def melt(b: pa.Table) -> pa.Table:
        n = len(b)
        users = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cols = [f"n_{t}" for t in EVENT_TYPES]
        counts = np.stack(
            [b.column(c).to_numpy(zero_copy_only=False).astype(np.int64) for c in cols]
        )
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(np.tile(users, len(cols))),
                "event_type": pa.array(
                    np.repeat(np.array(EVENT_TYPES, dtype=object), n)
                ),
                "n": pa.array(counts.reshape(-1)),
            }
        )

    return pivot.map_batches(melt, batch_format="pyarrow")


def sql_user_event_unpivot() -> str:
    cols = ", ".join(f"n_{t}" for t in EVENT_TYPES)
    return (
        f"SELECT user_id, substr(name, 3) AS event_type, n\n"
        f"FROM (UNPIVOT ({sql_user_event_pivot()})\n"
        f"  ON {cols} INTO NAME name VALUE n)"
    )


def q_dup_shingle_stats(sf_dir: str):
    """Corpus-internal duplicate n-gram fraction per doc (exact)."""
    from ..stages.dedup_approx import dup_shingle_stats

    return dup_shingle_stats(_docs(sf_dir, columns=["doc_id", "text"]))


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer-merge training over the documents corpus. Value-exact
    DuckDB oracle: the fixed-n_merges loop unrolls into per-rank chained
    CTEs (stages/bpe.sql_bpe_merges — double-delimiter pair encoding makes
    plain replace() reproduce the trainer's in-word scan)."""
    from ..stages.bpe import bpe_train

    return bpe_train(_docs(sf_dir, columns=["doc_id", "text"]))


def q_bpe_encoded_counts(sf_dir: str):
    """Train-then-apply BPE: learn the merge table (one vocab pass), then
    tokenize every document with it — per-doc BPE token counts. Value-exact
    DuckDB oracle (stages/bpe.sql_bpe_encoded_counts): the final vocabulary
    segmentation from the unrolled merge chain joins each document's token
    stream."""
    from ..stages.bpe import bpe_encode

    return bpe_encode(_docs(sf_dir, columns=["doc_id", "text"]))


def q_regression_stats(sf_dir: str):
    """Sufficient statistics for covariance / OLS slope per group, kept as
    EXACT integers (cents-scaled) so the cross-engine hash can't drift:
    n, sum_x, sum_y, sum_xy, sum_x2 over (quantity, extendedprice). The
    downstream slope/corr is one driver-side float expression; shipping the
    moments instead of the floats is also the right distributed shape (they
    combine associatively)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def prep(b: pa.Table) -> pa.Table:
        qty = b.column("l_quantity").cast(pa.int64())
        cents = pc.round(pc.multiply(b.column("l_extendedprice"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        return pa.Table.from_pydict(
            {
                "l_returnflag": b.column("l_returnflag"),
                "x": qty,
                "y": cents,
                "xy": pc.multiply(qty, cents),
                "x2": pc.multiply(qty, qty),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sum_x"),
            Sum("y", alias_name="sum_y"),
            Sum("xy", alias_name="sum_xy"),
            Sum("x2", alias_name="sum_x2"),
        )
    )


def sql_regression_stats() -> str:
    return (
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_x,\n"
        "  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)\n"
        "    AS sum_y,\n"
        "  CAST(sum(CAST(l_quantity AS BIGINT)\n"
        "      * CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_xy,\n"
        "  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))\n"
        "    AS BIGINT) AS sum_x2\n"
        "FROM lineitem GROUP BY l_returnflag"
    )


NTILE_BUCKETS = 4


def q_customer_ntile(sf_dir: str):
    """Global ROW_NUMBER / NTILE / PERCENT_RANK over customers by account
    balance: range-partitioned sort + per-block ordinal offsets
    (zipWithIndex shape), then vectorized NTILE bucketing. The sort key
    includes c_custkey so row numbers are unique and both engines agree."""
    import ray.data as rd

    from ..stages.rank import global_row_number, ntile_from_rn

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_acctbal"]
    )

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(b.column("c_acctbal"), pa.scalar(100.0))).cast(
            pa.int64()
        )
        return pa.Table.from_pydict(
            {"c_custkey": b.column("c_custkey"), "acctbal_cents": cents}
        )

    ds = cust.map_batches(to_cents, batch_format="pyarrow")
    ds = global_row_number(
        ds, ["acctbal_cents", "c_custkey"], descending=[True, False]
    )
    total = ds.count()

    def derive(b: pa.Table) -> pa.Table:
        rn = b.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        quart = ntile_from_rn(rn, total, NTILE_BUCKETS)
        pr = (rn - 1) / (total - 1) if total > 1 else np.zeros(len(rn))
        return pa.Table.from_pydict(
            {
                "c_custkey": b.column("c_custkey"),
                "acctbal_cents": b.column("acctbal_cents"),
                "rn": b.column("rn"),
                "quartile": pa.array(quart),
                "pct_rank": pa.array(pr, type=pa.float64()),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")


def sql_customer_ntile() -> str:
    return (
        f"SELECT c_custkey,\n"
        f"  CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,\n"
        f"  row_number() OVER w AS rn,\n"
        f"  CAST(ntile({NTILE_BUCKETS}) OVER w AS BIGINT) AS quartile,\n"
        f"  percent_rank() OVER w AS pct_rank\n"
        f"FROM customer\n"
        f"WINDOW w AS (ORDER BY CAST(round(c_acctbal*100) AS BIGINT) DESC,"
        f" c_custkey)"
    )


def q_nation_acctbal_ranks(sf_dir: str):
    """DENSE_RANK within each nation by account balance (descending):
    groupby(nation).map_groups, rank via vectorized change-flag cumsum."""
    import ray.data as rd

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def rank_group(g: pa.Table) -> pa.Table:
        cents = (
            pc.round(pc.multiply(g.column("c_acctbal"), pa.scalar(100.0)))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        key = g.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((key, -cents))
        cents_s = cents[order]
        dense = np.ones(len(cents_s), dtype=np.int64)
        if len(cents_s) > 1:
            dense[1:] = (cents_s[1:] != cents_s[:-1]).astype(np.int64)
        dense = np.cumsum(dense)
        return pa.Table.from_pydict(
            {
                "c_nationkey": g.column("c_nationkey").take(pa.array(order)),
                "c_custkey": pa.array(key[order]),
                "acctbal_cents": pa.array(cents_s),
                "dense_rank": pa.array(dense),
            }
        )

    return cust.groupby("c_nationkey").map_groups(rank_group, batch_format="pyarrow")


def sql_nation_acctbal_ranks() -> str:
    return (
        "SELECT c_nationkey, c_custkey,\n"
        "  CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,\n"
        "  dense_rank() OVER (PARTITION BY c_nationkey\n"
        "    ORDER BY CAST(round(c_acctbal*100) AS BIGINT) DESC) AS dense_rank\n"
        "FROM customer"
    )


def q_embedding_dim_stats(sf_dir: str):
    """List-column explode + per-dimension aggregate: min/max of each
    embedding dimension. Extrema are exact comparisons (no accumulation),
    and float32 -> float64 widening is value-preserving, so both engines
    hash-match bit-exactly. The per-batch partial is <= dim rows — explode
    never leaves the batch."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )

    def partial(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = len(col[0])
        mat = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(-1, dim)
        )
        return pa.Table.from_pydict(
            {
                # 1-based to match generate_subscripts in the oracle
                "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
                "v_min": pa.array(mat.min(axis=0)),
                "v_max": pa.array(mat.max(axis=0)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("v_min", alias_name="v_min"), Max("v_max", alias_name="v_max"))
    )


def sql_embedding_dim_stats() -> str:
    return (
        "SELECT dim, min(v) AS v_min, max(v) AS v_max\n"
        "FROM (SELECT generate_subscripts(embedding, 1) AS dim,\n"
        "        CAST(unnest(embedding) AS DOUBLE) AS v\n"
        "      FROM embeddings)\n"
        "GROUP BY dim"
    )


def q_embedding_int8(sf_dir: str):
    """Int8 embedding quantization (the 4x vector-memory compression an
    ANN index applies before sharding): per-vector absmax scale,
    q = round_away(127 * v / absmax) — every op is one IEEE-double
    expression evaluated in the same order on both engines, so the
    long-form output is bit-exact against SQL. Zero-shuffle batch map;
    zero vectors quantize to 0."""
    import ray.data as rd

    from ..kernel.rounding import round_away

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def quant(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "dim": pa.array([], type=pa.int64()),
                    "q8": pa.array([], type=pa.int64()),
                }
            )
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // n
        mat = flat.reshape(n, dim)
        m = np.abs(mat).max(axis=1)
        safe = np.where(m == 0.0, 1.0, m)
        q = round_away(127.0 * mat / safe[:, None], 0).astype(np.int64)
        q[m == 0.0, :] = 0
        vids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vids, dim), type=pa.int64()),
                "dim": pa.array(
                    np.tile(np.arange(1, dim + 1, dtype=np.int64), n), type=pa.int64()
                ),
                "q8": pa.array(q.reshape(-1), type=pa.int64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


def sql_embedding_int8() -> str:
    return (
        "SELECT vec_id, CAST(dim AS BIGINT) AS dim,\n"
        "  CAST(CASE WHEN m = 0 THEN 0\n"
        "       ELSE round(127.0 * v / m) END AS BIGINT) AS q8\n"
        "FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,\n"
        "        CAST(unnest(embedding) AS DOUBLE) AS v,\n"
        "        CAST(list_max(list_transform(embedding, x -> abs(x)))\n"
        "          AS DOUBLE) AS m\n"
        "      FROM embeddings)"
    )


def q_embedding_kmeans(sf_dir: str):
    """K-means cluster ASSIGNMENT over the embeddings table under
    seeded literal-inlined centroids (stages/kmeans seeded arm — the
    stages/ivfpq seeded-oracle pattern): squared distances accumulate in
    dimension order on BOTH engines, so the assignment is VALUE-EXACT
    against closed DuckDB SQL (graduated from rows-only in round 5).
    One zero-shuffle broadcast-centroid pass — the E-step / cluster
    serving shape. The iterative Lloyd TRAINER (stages/kmeans.kmeans)
    remains the training path, pinned by determinism/parallelism/recovery
    tests; its per-dimension float means drift ulps across engines, which
    is exactly why the oracle-checked contract runs the seeded arm."""
    import ray.data as rd

    from ..stages.kmeans import kmeans_assign_seeded

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return kmeans_assign_seeded(ds)


def q_snapshot_diff(sf_dir: str):
    """Crawl-refresh snapshot diff: compare two corpus snapshots by content
    hash with ONE full-outer hash join on doc_id, emitting
    added / removed / changed / same per id — the delta a recrawl pipeline
    feeds to incremental downstream stages. Snapshot B derives
    deterministically from the documents table: ids ending in 7 dropped
    (removed), even ids re-extracted with different text (changed), fresh
    ids ending in 3 added (doc_id + 1,000,000). Both sides are hashed to
    one md5 per doc before the join — content never shuffles."""
    import pyarrow.compute as pc

    from ..kernel.hashing import hash_texts

    def hashed(b: pa.Table, mutate: bool) -> pa.Table:
        ids = b.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        t = b.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if mutate:
            # drop removed ids: doc_id % 10 == 7
            mod10 = pc.subtract(
                ids, pc.multiply(pc.divide(ids, pa.scalar(10, type=pa.int64())),
                                 pa.scalar(10, type=pa.int64()))
            )
            keep = pc.invert(pc.equal(mod10, pa.scalar(7, type=pa.int64())))
            ids_k = ids.filter(keep)
            t_k = t.filter(keep)
            even = pc.equal(
                pc.bit_wise_and(ids_k, pa.scalar(1, type=pa.int64())),
                pa.scalar(0, type=pa.int64()),
            )
            t_k = pc.if_else(
                even, pc.binary_join_element_wise(t_k, " v2", ""), t_k
            )
            # fresh ids: originals ending in 3 spawn doc_id + 1_000_000
            add_mask = pc.equal(mod10, pa.scalar(3, type=pa.int64()))
            new_ids = pc.add(
                ids.filter(add_mask), pa.scalar(1_000_000, type=pa.int64())
            )
            new_txt = pc.binary_join_element_wise(
                pa.array(["new"] * len(new_ids), type=pa.string()),
                pc.cast(new_ids, pa.string()),
                " ",
            )
            ids_k = pa.concat_arrays([ids_k, new_ids])
            t_k = pa.concat_arrays(
                [t_k.cast(pa.string()), new_txt.cast(pa.string())]
            )
            ids, t = ids_k, t_k
        h = pa.array(hash_texts(t.to_pylist()), type=pa.string())
        return pa.table({"doc_id": ids, "h": h})

    a = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        lambda b: hashed(b, False), batch_format="pyarrow"
    ).repartition(8)
    bsnap = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        lambda b: hashed(b, True), batch_format="pyarrow"
    ).repartition(8)
    joined = a.join(
        bsnap,
        "full_outer",
        num_partitions=8,
        on=("doc_id",),
        right_on=("doc_id",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def status(b: pa.Table) -> pa.Table:
        ha = b.column("h_a")
        hb = b.column("h_b")
        st = pc.if_else(
            pc.is_null(ha),
            pa.scalar("added", type=pa.string()),
            pc.if_else(
                pc.is_null(hb),
                pa.scalar("removed", type=pa.string()),
                pc.if_else(
                    pc.equal(ha, hb),
                    pa.scalar("same", type=pa.string()),
                    pa.scalar("changed", type=pa.string()),
                ),
            ),
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks().cast(pa.int64()),
                "status": st,
            }
        )

    return joined.map_batches(status, batch_format="pyarrow")


def sql_snapshot_diff() -> str:
    return (
        "WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),\n"
        "b AS (\n"
        "  SELECT doc_id, md5(CASE WHEN doc_id % 2 = 0 THEN text || ' v2'\n"
        "    ELSE text END) AS h\n"
        "  FROM documents WHERE doc_id % 10 <> 7\n"
        "  UNION ALL\n"
        "  SELECT doc_id + 1000000 AS doc_id,\n"
        "    md5('new' || ' ' || CAST(doc_id + 1000000 AS VARCHAR)) AS h\n"
        "  FROM documents WHERE doc_id % 10 = 3)\n"
        "SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,\n"
        "  CASE WHEN a.h IS NULL THEN 'added'\n"
        "       WHEN b.h IS NULL THEN 'removed'\n"
        "       WHEN a.h = b.h THEN 'same' ELSE 'changed' END AS status\n"
        "FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id"
    )


def _synth_host(b: pa.Table) -> pa.Array:
    """Deterministic synthetic host per row from (doc_id, source) — the
    same 32-bucket derivation as ``sql_host_quality``'s SQL expression
    (host quality, boilerplate and curation queries must agree on it)."""
    did = b.column("doc_id").combine_chunks().cast(pa.string())
    n = pc.binary_length(did).cast(pa.int64())
    bucket = pc.bit_wise_and(
        pc.add(
            pc.multiply(n, pa.scalar(7, type=pa.int64())),
            pc.utf8_length(b.column("source").combine_chunks()).cast(pa.int64()),
        ),
        pa.scalar(31, type=pa.int64()),
    )
    return pc.binary_join_element_wise(
        pa.array(["host"] * len(b), type=pa.string()),
        pc.cast(bucket, pa.string()),
        pa.array([".example.com"] * len(b), type=pa.string()),
        "",
    )


_SQL_HOST_EXPR = (
    "'host' || CAST((length(CAST(doc_id AS VARCHAR)) * 7 + length(source)) % 32"
    " AS VARCHAR) || '.example.com'"
)


def q_host_quality(sf_dir: str, min_tokens: int = 30):
    """RefinedWeb-style domain-level curation: per-HOST document counts
    and good-document counts (token count >= min_tokens), with the keep
    decision 2*n_good >= n_docs as an integer cross-multiply (no IEEE
    division to drift). Hosts derive deterministically from (doc_id,
    source) as in url_filtered_docs. One bounded shuffle: the per-batch
    combiner emits at most one row per distinct host (32 here; at web
    scale host cardinality ~10^7 — still tiny vs the corpus)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.text_analysis import TOKEN_RE

    def partial(b: pa.Table) -> pa.Table:
        host = _synth_host(b)
        good = pc.cast(
            pc.greater_equal(
                pc.count_substring_regex(b.column("text"), TOKEN_RE).cast(
                    pa.int64()
                ),
                pa.scalar(min_tokens, type=pa.int64()),
            ),
            pa.int64(),
        )
        t = pa.table({"host": host, "good": good})
        out = t.group_by(["host"]).aggregate([("good", "sum"), ("good", "count")])
        return out.rename_columns(["host", "p_good", "p_docs"])

    stats = (
        _docs(sf_dir, columns=["doc_id", "source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("p_docs", alias_name="n_docs"), Sum("p_good", alias_name="n_good")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        keep = pc.cast(
            pc.greater_equal(
                pc.multiply(b.column("n_good"), pa.scalar(2, type=pa.int64())),
                b.column("n_docs"),
            ),
            pa.int64(),
        )
        return b.append_column("keep", keep)

    return stats.map_batches(finish, batch_format="pyarrow")


def q_similarity_join_exact(sf_dir: str):
    """Exact set-similarity self-join (PPJoin-style prefix filtering, no
    false negatives): all doc pairs with word-3-gram shingle-set Jaccard
    >= 1/2 (TAU = (1, 2); stages/setjoin.similarity_join)."""
    from ..stages.setjoin import similarity_join

    return similarity_join(_docs(sf_dir, columns=["doc_id", "text"]))


def q_crawl_budget(sf_dir: str, budget: int = 1000):
    """Crawl-frontier budget allocation: split a fixed fetch budget across
    hosts proportional to their document counts with the largest-remainder
    (Hamilton) method — base = floor(B*n/total) per host, the leftover
    slots going to the largest remainders (ties by host asc). Exact
    integer arithmetic end to end; Σbudget == B by construction.

    Shape: per-batch host-count combiner -> one groupby-sum on the
    dimension-bounded host key -> the allocation itself runs inside ONE
    single-block map (repartition(1)) because it needs the global total
    and remainder ranking — bounded by host cardinality (32 here, ~10^7
    at web scale: one block of per-host rows, never documents)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"host": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        g = pa.table({"host": _synth_host(b)}).group_by(["host"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["host", "n"])

    counts = (
        _docs(sf_dir, columns=["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n", alias_name="n_docs"))
    )

    def allocate(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "host": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "budget": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        n = b.column("n_docs").combine_chunks().to_numpy(zero_copy_only=False)
        hosts = b.column("host").combine_chunks().to_numpy(zero_copy_only=False)
        tot = int(n.sum())
        if tot == 0:
            return empty
        base = (budget * n) // tot
        rem = (budget * n) % tot
        leftover = budget - int(base.sum())
        order = np.lexsort((hosts, -rem))  # remainder desc, host asc
        bonus = np.zeros(len(n), dtype=np.int64)
        bonus[order[:leftover]] = 1
        return pa.table(
            {
                "host": b.column("host"),
                "n_docs": b.column("n_docs"),
                "budget": pa.array(base + bonus),
            }
        )

    return counts.repartition(1).map_batches(allocate, batch_format="pyarrow")


def sql_crawl_budget(budget: int = 1000) -> str:
    return (
        f"WITH h AS (SELECT {_SQL_HOST_EXPR} AS host, count(*) AS n\n"
        f"           FROM documents GROUP BY 1),\n"
        f"t AS (SELECT sum(n) AS tot FROM h),\n"
        f"a AS (SELECT host, n, ({budget} * n) // tot AS base,\n"
        f"             ({budget} * n) % tot AS rem FROM h CROSS JOIN t),\n"
        f"l AS (SELECT {budget} - sum(base) AS leftover FROM a),\n"
        f"r AS (SELECT host, n, base,\n"
        f"             row_number() OVER (ORDER BY rem DESC, host) AS rk FROM a)\n"
        f"SELECT host, CAST(n AS BIGINT) AS n_docs,\n"
        f"       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END\n"
        f"            AS BIGINT) AS budget\n"
        f"FROM r CROSS JOIN l"
    )


def sql_host_quality(min_tokens: int = 30) -> str:
    from ..stages.text_analysis import TOKEN_RE

    return (
        f"WITH t AS (\n"
        f"  SELECT 'host' || CAST(\n"
        f"      (length(CAST(doc_id AS VARCHAR)) * 7 + length(source)) % 32\n"
        f"      AS VARCHAR) || '.example.com' AS host,\n"
        f"    CASE WHEN length(regexp_extract_all(text, '{TOKEN_RE}'))\n"
        f"      >= {min_tokens} THEN 1 ELSE 0 END AS good\n"
        f"  FROM documents)\n"
        f"SELECT host, CAST(count(*) AS BIGINT) AS n_docs,\n"
        f"  CAST(sum(good) AS BIGINT) AS n_good,\n"
        f"  CAST(2 * sum(good) >= count(*) AS BIGINT) AS keep\n"
        f"FROM t GROUP BY host"
    )


def _host_boiler_input(sf_dir: str):
    """(doc_id, host, text) input for the boilerplate queries: synthetic
    host (same derivation as ``q_host_quality``) and lines derived by
    splitting at the literal token ' the ' (the single-line synthetic
    docs' deterministic line derivation, as in ``q_line_dedup_docs``)."""
    ds = _docs(sf_dir, columns=["doc_id", "source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "host": _synth_host(b),
                "text": pc.replace_substring(b.column("text"), " the ", "\n"),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def q_host_boilerplate_lines(sf_dir: str, min_docs: int = 2):
    """Per-host boilerplate (site-template) lines: non-blank lines
    appearing in >= min_docs distinct documents of the same host."""
    from ..stages.text_analysis import host_boilerplate_lines

    return host_boilerplate_lines(_host_boiler_input(sf_dir), min_docs=min_docs)


def q_host_boilerplate_docs(sf_dir: str, min_docs: int = 2):
    """Documents with per-host boilerplate lines stripped (CCNet/
    RefinedWeb site-template removal): (doc_id, text_clean, n_kept)."""
    from ..stages.text_analysis import host_boilerplate_strip

    return host_boilerplate_strip(_host_boiler_input(sf_dir), min_docs=min_docs)


def _sql_host_boiler_ctes(min_docs: int = 2) -> str:
    return (
        f"WITH t AS (\n"
        f"  SELECT doc_id, {_SQL_HOST_EXPR} AS host,\n"
        f"    replace(text, ' the ', chr(10)) AS text FROM documents),\n"
        f"lines AS (\n"
        f"  SELECT doc_id, host,\n"
        f"    CAST(unnest(generate_series(1, len(l))) - 1 AS BIGINT) AS line_no,\n"
        f"    unnest(l) AS line\n"
        f"  FROM (SELECT doc_id, host, string_split(text, chr(10)) AS l FROM t)),\n"
        f"boiler AS (\n"
        f"  SELECT host, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs\n"
        f"  FROM lines WHERE trim(line, ' ' || chr(9) || chr(13)) <> ''\n"
        f"  GROUP BY host, line HAVING count(DISTINCT doc_id) >= {min_docs})\n"
    )


def sql_host_boilerplate_lines(min_docs: int = 2) -> str:
    return _sql_host_boiler_ctes(min_docs) + "SELECT host, line, n_docs FROM boiler"


def sql_host_boilerplate_docs(min_docs: int = 2) -> str:
    return (
        _sql_host_boiler_ctes(min_docs)
        + ", kept AS (\n"
        "  SELECT l.doc_id, l.line_no, l.line FROM lines l\n"
        "  LEFT JOIN boiler b ON l.host = b.host AND l.line = b.line\n"
        "  WHERE b.line IS NULL)\n"
        "SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text_clean,\n"
        "  CAST(count(*) AS BIGINT) AS n_kept\n"
        "FROM kept GROUP BY doc_id"
    )


def q_web_curation(sf_dir: str, min_docs: int = 2):
    """RefinedWeb-style curation chain composed END TO END: per-host
    boilerplate strip -> Gopher composite quality gate on the cleaned text
    -> exact content dedup of survivors (min doc id wins) -> whitespace
    token count. One SQL oracle covers the whole chain, so the composition
    (not just each stage) is value-verified.

    Shuffle budget: boilerplate anti-join (bounded drop side) + doc
    reassembly groupby + the final content-hash groupby (uniform key by
    construction). The Gopher gate and token count ride the same batch
    pass — zero extra exchanges."""
    from ray.data.aggregate import Count, Min

    from ..kernel.hashing import hash_texts
    from ..stages.text_analysis import (
        TOKEN_RE,
        add_gopher_quality,
        host_boilerplate_strip,
    )

    clean = host_boilerplate_strip(_host_boiler_input(sf_dir), min_docs=min_docs)

    def gate_hash(b: pa.Table) -> pa.Table:
        g = add_gopher_quality(b, text_col="text_clean")
        g = g.filter(pc.equal(g.column("keep").combine_chunks(), 1))
        texts = g.column("text_clean")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pa.table(
            {
                "text_hash": pa.array(
                    hash_texts(texts.to_pylist()), type=pa.string()
                ),
                "doc_id": g.column("doc_id"),
                "n_tokens": pc.count_substring_regex(texts, TOKEN_RE).cast(
                    pa.int64()
                ),
            }
        )

    h = clean.map_batches(gate_hash, batch_format="pyarrow")
    return h.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Min("n_tokens", alias_name="n_tokens"),
        Count(alias_name="n_dupes"),
    )


def sql_web_curation(min_docs: int = 2) -> str:
    from ..stages.text_analysis import TOKEN_RE, sql_gopher_filter

    gate = sql_gopher_filter(
        table="(SELECT doc_id, text_clean AS text FROM docs2) gsrc"
    )
    return (
        _sql_host_boiler_ctes(min_docs)
        + ", kept AS (\n"
        "  SELECT l.doc_id, l.line_no, l.line FROM lines l\n"
        "  LEFT JOIN boiler b ON l.host = b.host AND l.line = b.line\n"
        "  WHERE b.line IS NULL),\n"
        "docs2 AS (\n"
        "  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text_clean\n"
        "  FROM kept GROUP BY doc_id),\n"
        "gate AS (" + gate + "),\n"
        "fin AS (\n"
        "  SELECT d.doc_id, d.text_clean,\n"
        f"    CAST(length(regexp_extract_all(d.text_clean, '{TOKEN_RE}')) AS BIGINT)"
        " AS n_tokens\n"
        "  FROM docs2 d JOIN gate g ON d.doc_id = g.doc_id WHERE g.keep = 1)\n"
        "SELECT md5(text_clean) AS text_hash, min(doc_id) AS keep_doc_id,\n"
        "  min(n_tokens) AS n_tokens, CAST(count(*) AS BIGINT) AS n_dupes\n"
        "FROM fin GROUP BY md5(text_clean)"
    )


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings, drop
    within-cluster cosine near-duplicates (>= tau) keeping the lowest id.
    One shuffle (cluster-key groupby).

    The synthetic embeddings carry no natural near-dups (max off-diagonal
    cosine ~0.51), so the query PLANTS exact duplicates of the even
    vec_ids (id + 1,000,000): the prune provably fires — every planted
    copy lands in its original's cluster with cosine 1.0 and keep=0.

    SQL-ORACLED (value-exact, sql_semdedup): on this corpus the >=tau
    similarity graph is a perfect matching (planted copy <-> original at
    cos 1.0; every other pair <= ~0.51 << tau=0.95), so the greedy
    within-cluster prune equals the GLOBAL rule "drop iff some lower-id
    vector anywhere has cosine >= tau" — (a) identical vectors always
    co-cluster under k-means (identical distances -> identical argmin),
    (b) any lower-id >=tau neighbor of a dropped row is itself kept
    (a matching has no chains), (c) no cross-cluster pair reaches tau.
    DuckDB computes the global rule directly; the 0.95-vs-{1.0, 0.51}
    margin makes the threshold decision immune to float summation-order
    ulps. The cluster ids themselves are the one non-SQL-able artifact
    (float k-means means drift ulps across engines), so the contract
    returns (vec_id, keep) and pins cluster semantics via tests."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.semdedup import semdedup

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        even = pc.equal(pc.bit_wise_and(ids, 1), 0)
        dup = b.filter(even)
        dup = dup.set_column(
            dup.column_names.index("vec_id"),
            "vec_id",
            pc.add(dup.column("vec_id"), 1_000_000),
        )
        return pa.concat_tables([b, dup])

    out = semdedup(ds.map_batches(plant, batch_format="pyarrow"))
    return out.select_columns(["vec_id", "keep"])


def sql_semdedup(tau: float = 0.95) -> str:
    """Global-matching oracle for q_semdedup (see its docstring for the
    greedy-equivalence argument)."""
    return (
        "WITH allv AS (\n"
        "  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings\n"
        "  UNION ALL\n"
        "  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[])\n"
        "  FROM embeddings WHERE vec_id % 2 = 0),\n"
        "dropped AS (\n"
        "  SELECT DISTINCT a.vec_id\n"
        "  FROM allv a JOIN allv b ON b.vec_id < a.vec_id\n"
        f"  WHERE list_cosine_similarity(a.emb, b.emb) >= {tau})\n"
        "SELECT a.vec_id,\n"
        "  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep\n"
        "FROM allv a LEFT JOIN dropped d ON d.vec_id = a.vec_id"
    )


def q_rare_word_stats(sf_dir: str):
    """Gopher-style rare-word fraction vs the corpus top-K vocabulary."""
    from ..stages.text_analysis import rare_word_stats

    return rare_word_stats(_docs(sf_dir, columns=["doc_id", "text"]))


def q_bm25_topk(sf_dir: str):
    """Ranked full-text retrieval: BM25 top-10 docs for the standing query
    terms (stages/search.py — stats pass + broadcast-scalar scoring pass,
    k-bounded local combiner, bit-exact float oracle)."""
    from ..stages.search import bm25_topk

    return bm25_topk(_docs(sf_dir, columns=["doc_id", "text"]))


def q_mmr_topk(sf_dir: str):
    """Diversified retrieval: integer-exact Maximal Marginal Relevance
    re-ranking of the top-20 keyword pool (stages/search.mmr_topk)."""
    from ..stages.search import mmr_topk

    return mmr_topk(_docs(sf_dir, columns=["doc_id", "text"]))


def q_keyword_search(sf_dir: str):
    """Boolean AND keyword search (whole-token containment, zero-shuffle)."""
    from ..stages.text_analysis import keyword_search

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    return keyword_search(ds).select_columns(["doc_id", "lang"])


def q_quality_scores(sf_dir: str):
    """Heuristic quality score in [0,1]; rows-only."""
    from ..stages.text_analysis import add_quality_score

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_quality_score, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "quality_score"])

def q_gopher_filter(sf_dir: str):
    """Gopher/MassiveText composite quality gate: word-count bounds, mean
    word length, symbol ratio, alpha-word fraction and stopword presence
    combined into one all-integer keep decision (zero shuffles)."""
    from ..stages.text_analysis import add_gopher_quality

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    ds = ds.map_batches(add_gopher_quality, batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "n_words", "n_word_chars", "n_alpha_words", "n_sym", "n_stop", "keep"]
    )


def q_label_mention_counts(sf_dir: str):
    return label_counts(mentions_dataset(sf_dir))


def q_canonical_entities(sf_dir: str):
    return canonical_entities(mentions_dataset(sf_dir))


def q_canonical_entities_incremental(sf_dir: str):
    """Incremental KG maintenance with exact batch parity: the canonical
    entity table of the existing store (even doc_ids, persisted to parquet
    — the checkpointed state a long-running crawl accumulates) is MERGED
    with the delta crawl's table (odd doc_ids) by one groupby-sum on the
    canonical key. Counts are associative, so the merge must equal the
    full batch recompute — the oracle IS sql_canonical_entities over the
    whole corpus, making "incremental == from-scratch" an externally
    verified invariant, not a claim."""
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.canonicalize import canonical_entities

    base = canonical_entities(
        mentions_dataset(sf_dir).map_batches(
            _parity_filter(0), batch_format="pyarrow"
        )
    )
    store = tempfile.mkdtemp(prefix="qr_inc_store_")
    base.write_parquet(store)
    delta = canonical_entities(
        mentions_dataset(sf_dir).map_batches(
            _parity_filter(1), batch_format="pyarrow"
        )
    )
    merged = rd.read_parquet(store).union(delta)
    return merged.groupby(["entity_id", "surface_norm", "label"]).aggregate(
        Sum("n_mentions", alias_name="n_mentions")
    )


def q_triples(sf_dir: str):
    m = mentions_dataset(sf_dir)
    return m.map_batches(
        lambda b: add_triple_columns(b, subj_col="doc_id"), batch_format="pyarrow"
    )


def _pos_triple_store(sf_dir: str) -> str:
    """Build (or reuse) the POS permutation index for the corpus's triples.
    Cache keyed on the SOURCE's identity (path+size+mtime fingerprint,
    same rationale as _media_path) so regenerated testdata can never
    serve a stale store; finished permutations skip on re-run
    (resumable writes)."""
    import hashlib

    from ..sinks.triplestore import write_triple_store

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{os.path.realpath(src)}:{st.st_size}:{st.st_mtime_ns}:v1".encode()
    ).hexdigest()[:12]
    key = f"{os.path.basename(os.path.normpath(sf_dir))}-{fp}"
    store = f"/tmp/quickner_ray_tstore_{key}"
    if not (
        os.path.exists(os.path.join(store, "pos", "_DONE"))
        and os.path.exists(os.path.join(store, "stats", "_DONE"))
    ):
        write_triple_store(q_triples(sf_dir), store, perms=["pos"])
    return store


def _full_triple_store(sf_dir: str) -> str:
    """All three permutations + synopsis in the same cached store dir as
    _pos_triple_store (finished permutations skip on re-run, so the POS
    build is shared, not repeated)."""
    from ..sinks.triplestore import write_triple_store

    store = _pos_triple_store(sf_dir)  # ensures dir + pos + stats
    need = [
        p for p in ("spo", "osp")
        if not os.path.exists(os.path.join(store, p, "_DONE"))
    ]
    if need:
        write_triple_store(q_triples(sf_dir), store, perms=need)
    return store


def q_triple_store_lookup(sf_dir: str, pred: str = "OPERATOR"):
    """Triple-store materialize + point lookup: distinct (s,p,o) triples
    written as the three permutation indexes (sinks/triplestore.py —
    range-sorted Parquet whose row-group stats prune any-position
    lookups), then the POS index answers 'all triples with predicate X'
    reading only admitting fragments."""
    from ..sinks.triplestore import lookup

    return lookup(_pos_triple_store(sf_dir), "pred", pred)


def sql_triple_store_lookup(pred: str = "OPERATOR") -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        f"SELECT CAST(doc_id AS VARCHAR) AS subj, plabel AS pred, eid AS obj,\n"
        f"       CAST(count(*) AS BIGINT) AS n_mentions\n"
        f"FROM acc WHERE plabel = '{pred}'\n"
        f"GROUP BY 1, 2, 3"
    )


def q_triple_store_lookup_delta(sf_dir: str, pred: str = "OPERATOR"):
    """Incremental triple-store maintenance, driver-checked: the base POS
    permutation index is built from the EVEN-doc_id half of the corpus
    only; the ODD half is then MERGED as a range-sorted LSM delta
    partition (sinks/triplestore.apply_triple_delta — |delta| work, no
    rebuild). The lookup must answer identically to a store built from
    the whole corpus (the oracle is the full-corpus SQL), which exercises
    the split-key re-aggregation read path across base + delta runs.
    ``compact_store`` folding deltas back to one run is pinned
    value-identical to a full rebuild by tests/test_triplestore.py."""
    from ..sinks.triplestore import (
        _delta_dirs,
        apply_triple_delta,
        lookup,
        write_triple_store,
    )

    store = f"/tmp/quickner_ray_tstore_delta_{_corpus_cache_key(sf_dir, 'v1')}"

    def half(parity: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("subj")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            ids = pc.cast(ids, pa.int64())
            return b.filter(pc.equal(pc.bit_wise_and(ids, 1), parity))

        return q_triples(sf_dir).map_batches(f, batch_format="pyarrow")

    pos_dir = os.path.join(store, "pos")
    if not os.path.exists(os.path.join(pos_dir, "_DONE")):
        write_triple_store(half(0), store, perms=["pos"])
    if not _delta_dirs(pos_dir):  # idempotent: apply the odd half ONCE
        apply_triple_delta(store, half(1), perms=["pos"])
    return lookup(store, "pred", pred)


def sql_triple_store_lookup_delta(pred: str = "OPERATOR") -> str:
    return sql_triple_store_lookup(pred)


def q_triple_store_update(sf_dir: str, pred: str = "OPERATOR"):
    """SPARQL 1.1 Update executed against the permutation store
    (serving.sparql_update -> kernel/sparql.parse_update): ONE request
    mixing a DELETE DATA of a store-present triple (the lexicographically
    first (subj, obj) under ``pred``; its retraction amount comes from a
    pruned point lookup against the pre-update store), an INSERT that a
    later DELETE in the same request voids (sequence semantics), and two
    surviving INSERTs. The whole request lands as ONE LSM delta
    generation (|delta| work, no rebuild); the POS lookup then reads
    base + delta, re-aggregates split keys, drops the retracted victim
    (support folded to 0), and must answer the full-corpus oracle minus
    the victim plus the surviving inserts. Idempotent per store: the
    update applies once (guarded on the delta roster), so cached re-runs
    re-read, never re-apply."""
    from ..serving import sparql_update
    from ..sinks.triplestore import _delta_dirs, lookup, write_triple_store

    store = f"/tmp/quickner_ray_tstore_upd_{_corpus_cache_key(sf_dir, 'v1')}"
    need = [
        p for p in ("spo", "pos")
        if not os.path.exists(os.path.join(store, p, "_DONE"))
    ]
    if need:
        write_triple_store(q_triples(sf_dir), store, perms=need)
    if not _delta_dirs(os.path.join(store, "pos")):
        victim = (
            lookup(store, "pred", pred).sort(["subj", "obj"]).limit(1).take(1)[0]
        )
        req = (
            f'DELETE DATA {{ "{victim["subj"]}" :{pred} "{victim["obj"]}" }} ;\n'
            f'INSERT DATA {{ "upd:d1" :{pred} "upd:voided" .\n'
            f'               "upd:d1" :{pred} "upd:kept" }} ;\n'
            f'DELETE DATA {{ "upd:d1" :{pred} "upd:voided" }} ;\n'
            f'INSERT DATA {{ "upd:d2" :{pred} "upd:kept" }}'
        )
        sparql_update(store, req, perms=["spo", "pos"])
    return lookup(store, "pred", pred)


def sql_triple_store_update(pred: str = "OPERATOR") -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"base AS (SELECT CAST(doc_id AS VARCHAR) AS subj, plabel AS pred,\n"
        f"         eid AS obj, CAST(count(*) AS BIGINT) AS n_mentions\n"
        f"         FROM acc WHERE plabel = '{pred}' GROUP BY 1, 2, 3),\n"
        f"victim AS (SELECT subj, obj FROM base ORDER BY subj, obj LIMIT 1)\n"
        f"SELECT b.* FROM base b WHERE NOT EXISTS (\n"
        f"  SELECT 1 FROM victim v WHERE v.subj = b.subj AND v.obj = b.obj)\n"
        f"UNION ALL\n"
        f"SELECT * FROM (VALUES\n"
        f"  ('upd:d1', '{pred}', 'upd:kept', CAST(1 AS BIGINT)),\n"
        f"  ('upd:d2', '{pred}', 'upd:kept', CAST(1 AS BIGINT)))\n"
        f"  t(subj, pred, obj, n_mentions)"
    )


def q_kg_sparql_update(sf_dir: str):
    """Pattern-template SPARQL UPDATE round-trip over the LSM store
    (serving.sparql_update -> kernel/sparql.parse_update_request): ONE
    ``DELETE { ?d :OPERATOR ?o } INSERT { ?d :OP_RENAMED ?o } WHERE
    { ?d :OPERATOR ?o }`` request renames a predicate. The WHERE bindings
    stream from the served BGP engine; the delete keys join the SPO base
    (bucketed hash join) to retract full current support; inserts add
    support 1 per distinct key; everything lands as ONE delta generation.
    The result unions the served SELECTs over BOTH predicates — the old
    one must fold to zero rows (delete verified), the new one must equal
    the distinct (doc, entity) OPERATOR pairs (insert verified). Applied
    once per cached store (delta-roster guard), so re-runs re-read."""
    from ..serving import sparql_select, sparql_update
    from ..sinks.triplestore import _delta_dirs, write_triple_store

    store = f"/tmp/quickner_ray_tstore_updw_{_corpus_cache_key(sf_dir, 'v1')}"
    need = [
        p for p in ("spo", "pos")
        if not os.path.exists(os.path.join(store, p, "_DONE"))
    ]
    if need:
        write_triple_store(q_triples(sf_dir), store, perms=need)
    if not _delta_dirs(os.path.join(store, "spo")):
        sparql_update(
            store,
            "DELETE { ?d :OPERATOR ?o . } INSERT { ?d :OP_RENAMED ?o . } "
            "WHERE { ?d :OPERATOR ?o . }",
            perms=["spo", "pos"],
        )

    def tag(pred):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "pred": pa.array([pred] * b.num_rows, type=pa.string()),
                    "d": b.column("d"),
                    "o": b.column("o"),
                }
            )

        return f

    old = sparql_select(
        store, "SELECT ?d ?o WHERE { ?d :OPERATOR ?o . }"
    ).map_batches(tag("OPERATOR"), batch_format="pyarrow")
    new = sparql_select(
        store, "SELECT ?d ?o WHERE { ?d :OP_RENAMED ?o . }"
    ).map_batches(tag("OP_RENAMED"), batch_format="pyarrow")
    return old.union(new)


def sql_kg_sparql_update() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        "SELECT 'OP_RENAMED' AS pred, CAST(doc_id AS VARCHAR) AS d,\n"
        "       eid AS o\n"
        "FROM acc WHERE plabel = 'OPERATOR' GROUP BY 1, 2, 3"
    )


def q_triple_pattern_match(sf_dir: str):
    """SPARQL-style BGP conjunctive query over the extracted KG: bindings
    (?doc, ?op, ?unit) such that ?doc mentions the SYSTEM entity 'spark'
    AND some OPERATOR entity ?op AND some UNIT entity ?unit. Each pattern
    is one vectorized filter+project with a batch-local distinct; patterns
    fold through Ray's native partitioned hash join on the shared ?doc
    variable; one bounded groupby makes the bindings DISTINCT
    (stages/bgp.bgp_match)."""
    from ..stages.bgp import bgp_match
    from ..stages.canonicalize import entity_id

    spark = entity_id("spark", "SYSTEM")
    return bgp_match(
        q_triples(sf_dir),
        [
            ("?doc", "SYSTEM", spark),
            ("?doc", "OPERATOR", "?op"),
            ("?doc", "UNIT", "?unit"),
        ],
    )


def q_triple_pattern_match_indexed(sf_dir: str):
    """The same BGP as `triple_pattern_match`, evaluated AGAINST THE
    PERMUTATION-INDEX STORE instead of the extracted stream: every
    pattern binds its predicate, so each one reads only the POS-index
    fragments whose row-group stats admit that predicate
    (sinks/triplestore.lookup) — the index-pruned query path a 100 TB KG
    serves from. Must answer identically to the stream evaluation (same
    oracle)."""
    from ..sinks.triplestore import lookup
    from ..stages.bgp import bgp_match
    from ..stages.canonicalize import entity_id

    store = _pos_triple_store(sf_dir)
    spark = entity_id("spark", "SYSTEM")
    return bgp_match(
        None,
        [
            ("?doc", "SYSTEM", spark),
            ("?doc", "OPERATOR", "?op"),
            ("?doc", "UNIT", "?unit"),
        ],
        pattern_source=lambda pat: lookup(store, "pred", pat[1]),
    )


def sql_triple_pattern_match_indexed() -> str:
    return sql_triple_pattern_match()


def q_triple_pattern_match_planned(sf_dir: str):
    """The same BGP as `triple_pattern_match`, but the patterns are given
    in the WORST order (the unbounded UNIT and OPERATOR scans first, the
    selective spark-constant pattern last) and the engine reorders them
    itself: ``plan="cardinality"`` measures every pattern's exact match
    count in ONE shared scan and folds smallest-first
    (stages/bgp.plan_patterns) — cost-based join ordering, the planner
    step a 10^12-triple BGP needs. Must answer identically to the
    hand-ordered evaluation (same oracle)."""
    from ..stages.bgp import bgp_match
    from ..stages.canonicalize import entity_id

    spark = entity_id("spark", "SYSTEM")
    return bgp_match(
        q_triples(sf_dir),
        [
            ("?doc", "UNIT", "?unit"),
            ("?doc", "OPERATOR", "?op"),
            ("?doc", "SYSTEM", spark),
        ],
        plan="cardinality",
    )


def sql_triple_pattern_match_planned() -> str:
    return sql_triple_pattern_match()


def q_triple_pattern_match_stats(sf_dir: str):
    """The same worst-ordered BGP as `..._planned`, but the join order
    comes from the PERMUTATION STORE'S PER-PREDICATE SYNOPSIS
    (sinks/triplestore.read_store_stats -> stages/bgp
    plan_patterns_stats) — zero scans to plan — and each pattern reads
    only POS-index fragments admitting its predicate. Plan + prune from
    footer-sized metadata: the serving shape for a 10^12-triple store.
    Must answer identically to the stream evaluation (same oracle)."""
    from ..sinks.triplestore import lookup, read_store_stats
    from ..stages.bgp import bgp_match
    from ..stages.canonicalize import entity_id

    store = _pos_triple_store(sf_dir)
    spark = entity_id("spark", "SYSTEM")
    return bgp_match(
        None,
        [
            ("?doc", "UNIT", "?unit"),
            ("?doc", "OPERATOR", "?op"),
            ("?doc", "SYSTEM", spark),
        ],
        plan="stats",
        stats=read_store_stats(store),
        pattern_source=lambda pat: lookup(store, "pred", pat[1]),
    )


def sql_triple_pattern_match_stats() -> str:
    return sql_triple_pattern_match()


def sql_triple_pattern_match() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    spark = entity_id("spark", "SYSTEM")
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "tri AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj,"
        " plabel, eid FROM acc)\n"
        "SELECT DISTINCT a.subj AS doc, b.eid AS op, c.eid AS unit\n"
        "FROM tri a JOIN tri b ON a.subj = b.subj"
        " JOIN tri c ON a.subj = c.subj\n"
        f"WHERE a.plabel = 'SYSTEM' AND a.eid = '{spark}'\n"
        "  AND b.plabel = 'OPERATOR' AND c.plabel = 'UNIT'"
    )


def q_kg_optional_bgp(sf_dir: str):
    """SPARQL OPTIONAL over the extracted KG: bindings (?doc, ?op,
    ?unit) where ?doc mentions the SYSTEM entity 'spark' AND an OPERATOR
    ?op, with ?unit OPTIONALLY bound to a co-mentioned UNIT entity —
    docs with no UNIT mention KEEP their (doc, op) bindings with unit
    rendered as '' (SPARQL's unbound; '' not null so the value-hash
    compare is null-free). Execution: the required fold's bucketed hash
    join, then ONE bucketed LEFT OUTER join (stages/hashjoin.bucketed_join
    join_type="left outer") — bucket-local left outer is globally correct
    because a key's left and right rows co-locate. No reference
    counterpart (quickner has no query layer)."""
    from ..stages.bgp import bgp_match
    from ..stages.canonicalize import entity_id

    spark = entity_id("spark", "SYSTEM")
    return bgp_match(
        q_triples(sf_dir),
        [
            ("?doc", "SYSTEM", spark),
            ("?doc", "OPERATOR", "?op"),
        ],
        optional=[("?doc", "UNIT", "?unit")],
    )


def sql_kg_optional_bgp() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    spark = entity_id("spark", "SYSTEM")
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "tri AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj,"
        " plabel, eid FROM acc)\n"
        "SELECT DISTINCT a.subj AS doc, b.eid AS op,"
        " COALESCE(c.eid, '') AS unit\n"
        "FROM tri a JOIN tri b ON a.subj = b.subj AND b.plabel = 'OPERATOR'\n"
        "LEFT JOIN tri c ON a.subj = c.subj AND c.plabel = 'UNIT'\n"
        f"WHERE a.plabel = 'SYSTEM' AND a.eid = '{spark}'"
    )


def q_kg_negation_bgp(sf_dir: str):
    """SPARQL FILTER NOT EXISTS over the extracted KG: bindings (?doc,
    ?op) where ?doc mentions 'spark' (SYSTEM) AND an OPERATOR ?op and
    NO UNIT entity at all — the anti-join verb of the query layer.
    Execution: required fold, then ONE bucketed LEFT ANTI join keyed on
    ?doc against the UNIT pattern's bindings (right side projected to
    keys only — membership test, no payload shipped)."""
    from ..stages.bgp import bgp_match
    from ..stages.canonicalize import entity_id

    spark = entity_id("spark", "SYSTEM")
    return bgp_match(
        q_triples(sf_dir),
        [
            ("?doc", "SYSTEM", spark),
            ("?doc", "OPERATOR", "?op"),
        ],
        not_exists=[("?doc", "UNIT", "?unit")],
    )


def sql_kg_negation_bgp() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    spark = entity_id("spark", "SYSTEM")
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "tri AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj,"
        " plabel, eid FROM acc)\n"
        "SELECT DISTINCT a.subj AS doc, b.eid AS op\n"
        "FROM tri a JOIN tri b ON a.subj = b.subj AND b.plabel = 'OPERATOR'\n"
        f"WHERE a.plabel = 'SYSTEM' AND a.eid = '{spark}'\n"
        "  AND NOT EXISTS (SELECT 1 FROM tri c"
        " WHERE c.subj = a.subj AND c.plabel = 'UNIT')"
    )


def _kg_ontology():
    """The deterministic mini-ontology over the KG's predicate vocabulary
    (the gazetteer labels): a 3-level property hierarchy and a 3-level
    class hierarchy with domain/range typing — enough structure to
    exercise every RDFS rule (rdfs2/3/7/9 + transitivity) while staying
    driver-side tiny, the scale contract of stages/rdfs.py."""
    from ..stages.rdfs import RdfsSchema

    preds = ("OPERATOR", "SYSTEM", "UNIT", "ENTITY", "CONCEPT", "PHRASE")
    return RdfsSchema(
        sub_class_of=(
            ("OperatorTerm", "TechTerm"),
            ("SystemTerm", "TechTerm"),
            ("UnitTerm", "MeasureTerm"),
            ("TechTerm", "Term"),
            ("MeasureTerm", "Term"),
            ("BizTerm", "Term"),
            ("AbstractTerm", "Term"),
            ("PhraseTerm", "Term"),
        ),
        sub_property_of=(
            ("OPERATOR", "MENTIONS_COMPONENT"),
            ("SYSTEM", "MENTIONS_COMPONENT"),
            ("MENTIONS_COMPONENT", "MENTIONS"),
            ("UNIT", "MENTIONS_MEASURE"),
            ("MENTIONS_MEASURE", "MENTIONS"),
            ("ENTITY", "MENTIONS"),
            ("CONCEPT", "MENTIONS"),
            ("PHRASE", "MENTIONS"),
        ),
        domain=tuple((p, "Document") for p in preds),
        range=(
            ("OPERATOR", "OperatorTerm"),
            ("SYSTEM", "SystemTerm"),
            ("UNIT", "UnitTerm"),
            ("ENTITY", "BizTerm"),
            ("CONCEPT", "AbstractTerm"),
            ("PHRASE", "PhraseTerm"),
        ),
    )


def _sql_values(pairs, cols: str) -> str:
    rows = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    return f"({cols}) AS (VALUES {rows})"


def q_rdfs_types(sf_dir: str):
    """RDFS type entailment over the extracted KG (stages/rdfs.py): every
    DISTINCT (node, rdf_type) the mini-ontology implies — rdfs2 types the
    doc subjects via domain, rdfs3 types the entity objects via range,
    rdfs9 propagates each inferred type up the transitive subClassOf
    hierarchy. Schema closures fold driver-side into vectorized mask arms;
    the instance pass is zero-shuffle; one bounded groupby dedups."""
    from ..stages.rdfs import entailed_types

    return entailed_types(q_triples(sf_dir), _kg_ontology())


def sql_rdfs_types() -> str:
    """Independent oracle: the closure is computed by a RECURSIVE CTE over
    the DIRECT schema edges (the engine closes them in Python), so the two
    sides only agree if the transitive semantics match."""
    from .ner_oracle import sql_match_ctes

    ont = _kg_ontology()
    return (
        f"WITH RECURSIVE {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "tri AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj,"
        " plabel AS pred, eid AS obj FROM acc),\n"
        f"sc{_sql_values(ont.sub_class_of, 'cls, sup')},\n"
        "scc(cls, sup) AS (SELECT cls, sup FROM sc UNION\n"
        "  SELECT r.cls, s.sup FROM scc r JOIN sc s ON r.sup = s.cls),\n"
        f"dom{_sql_values(ont.domain, 'pred, cls')},\n"
        f"rng{_sql_values(ont.range, 'pred, cls')},\n"
        "direct_types AS (\n"
        "  SELECT t.subj AS node, d.cls AS rdf_type FROM tri t"
        " JOIN dom d ON t.pred = d.pred\n"
        "  UNION ALL SELECT t.obj, r.cls FROM tri t"
        " JOIN rng r ON t.pred = r.pred)\n"
        "SELECT DISTINCT node, rdf_type FROM (\n"
        "  SELECT node, rdf_type FROM direct_types\n"
        "  UNION ALL SELECT dt.node, s.sup FROM direct_types dt"
        " JOIN scc s ON dt.rdf_type = s.cls)"
    )


def q_rdfs_lifted_counts(sf_dir: str):
    """RDFS rdfs7 predicate lifting (stages/rdfs.lift_predicates): each
    triple entails one copy per transitive superproperty of its predicate;
    output = DISTINCT entailed triples counted per predicate — the KG's
    schema-level predicate profile after entailment."""
    from ray.data.aggregate import Count

    from ..stages.rdfs import lift_predicates

    return (
        lift_predicates(q_triples(sf_dir), _kg_ontology())
        .groupby("pred")
        .aggregate(Count(alias_name="n_triples"))
    )


def sql_rdfs_lifted_counts() -> str:
    from .ner_oracle import sql_match_ctes

    ont = _kg_ontology()
    return (
        f"WITH RECURSIVE {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "tri AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj,"
        " plabel AS pred, eid AS obj FROM acc),\n"
        f"sp{_sql_values(ont.sub_property_of, 'pred, sup')},\n"
        "spc(pred, sup) AS (SELECT pred, sup FROM sp UNION\n"
        "  SELECT r.pred, s.sup FROM spc r JOIN sp s ON r.sup = s.pred),\n"
        "lifted AS (\n"
        "  SELECT subj, pred, obj FROM tri\n"
        "  UNION SELECT t.subj, c.sup AS pred, t.obj FROM tri t"
        " JOIN spc c ON t.pred = c.pred)\n"
        "SELECT pred, CAST(count(*) AS BIGINT) AS n_triples"
        " FROM lifted GROUP BY pred"
    )


def _kg_shapes():
    from ..stages.canonicalize import entity_id
    from ..stages.shapes import ShapeConstraint

    allowed_units = tuple(
        entity_id(n, "UNIT")
        for n, lbl in DEFAULT_GAZETTEER
        if lbl == "UNIT" and n != "part"
    )
    return [
        ShapeConstraint("operator_max3", "OPERATOR", max_count=3),
        ShapeConstraint("unit_required", "UNIT", min_count=1),
        ShapeConstraint("unit_closed", "UNIT", allowed_objects=allowed_units),
    ]


def q_kg_shape_violations(sf_dir: str):
    """SHACL-lite validation of the extracted KG (stages/shapes.py):
    sh:maxCount (a doc may mention at most 3 distinct OPERATOR entities),
    sh:minCount (every doc with any mention must mention a UNIT) and
    sh:in (UNIT objects come from a closed set excluding 'part') evaluated
    in one distributed pass — distinct-edge-bounded count shuffles, an
    anti-join membership test for minCount, zero-shuffle is_in masks for
    the closed set. Output: DISTINCT (constraint_id, subj) violations."""
    from ..stages.shapes import shape_violations

    return shape_violations(q_triples(sf_dir), _kg_shapes())


def sql_kg_shape_violations() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    allowed = ", ".join(
        f"'{entity_id(n, 'UNIT')}'"
        for n, lbl in DEFAULT_GAZETTEER
        if lbl == "UNIT" and n != "part"
    )
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "tri AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj,"
        " plabel AS pred, eid AS obj FROM acc),\n"
        "counts AS (SELECT subj, pred, count(*) AS n_objs FROM tri"
        " GROUP BY subj, pred)\n"
        "SELECT DISTINCT constraint_id, subj FROM (\n"
        "  SELECT 'operator_max3' AS constraint_id, subj FROM counts\n"
        "    WHERE pred = 'OPERATOR' AND n_objs > 3\n"
        "  UNION ALL\n"
        "  SELECT 'unit_required', s.subj FROM"
        " (SELECT DISTINCT subj FROM tri) s\n"
        "    WHERE NOT EXISTS (SELECT 1 FROM counts c WHERE"
        " c.subj = s.subj AND c.pred = 'UNIT' AND c.n_objs >= 1)\n"
        "  UNION ALL\n"
        f"  SELECT 'unit_closed', subj FROM tri WHERE pred = 'UNIT'"
        f" AND obj NOT IN ({allowed}))"
    )


def q_kmv_entity_overlap(sf_dir: str):
    """KMV-sketch set-intersection estimate (Beyer et al. 2007) between
    two KG doc sets: A = docs mentioning the SYSTEM entity 'spark', B =
    docs mentioning any OPERATOR entity. Each side keeps only its k=256
    smallest distinct md5-h64 doc-id hashes, so the only exchange moves
    sketch-sized data regardless of corpus size — the mergeable-synopsis
    path to |A∩B| at 10^12 docs. All-integer output, bit-exact oracle
    (stages/sketch.kmv_overlap)."""
    import pyarrow.compute as pc2

    from ..stages.canonicalize import entity_id
    from ..stages.sketch import kmv_overlap

    spark = entity_id("spark", "SYSTEM")
    tri = q_triples(sf_dir)

    def side(pred: str, obj: str | None):
        def f(b: pa.Table) -> pa.Table:
            mask = pc2.equal(b.column("pred"), pa.scalar(pred))
            if obj is not None:
                mask = pc2.and_(mask, pc2.equal(b.column("obj"), pa.scalar(obj)))
            return b.filter(mask).select(["subj"])

        return tri.map_batches(f, batch_format="pyarrow")

    return kmv_overlap(side("SYSTEM", spark), side("OPERATOR", None), "subj")


def sql_kmv_entity_overlap() -> str:
    from ..stages.canonicalize import entity_id
    from ..stages.sketch import sql_kmv_overlap
    from .ner_oracle import sql_match_ctes

    spark = entity_id("spark", "SYSTEM")
    a = (
        "SELECT DISTINCT CAST(doc_id AS VARCHAR) AS v FROM acc "
        f"WHERE plabel = 'SYSTEM' AND eid = '{spark}'"
    )
    b = (
        "SELECT DISTINCT CAST(doc_id AS VARCHAR) AS v FROM acc "
        "WHERE plabel = 'OPERATOR'"
    )
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n{sql_kmv_overlap(a, b)}"
    )


PATH_DOC_MOD = 23  # sparse link subgraph: pages with doc_id % 23 == 0
PATH_MAX_HOPS = 3


def q_host_reachability(sf_dir: str):
    """SPARQL property-path closure over the web host graph: every host
    pair connected by a directed path of 1..3 cross-host links, labeled
    with its minimum hop count (stages/paths.min_hops_closure — semi-naive
    BFS, per-round wire cost |frontier| + |edges|, never path counts).
    Runs on the deterministic sparse subgraph (doc_id % 23 == 0) so the
    32-host universe doesn't saturate at one hop; the Ray path recovers
    the edges from raw HTML bytes while the oracle regenerates them
    arithmetically and closes them with a recursive CTE."""
    from ..stages.linkgraph import host_link_graph
    from ..stages.paths import min_hops_closure

    edges = host_link_graph(_linked_pages(sf_dir, mod=PATH_DOC_MOD))
    pairs = edges.map_batches(
        lambda b: pa.table(
            {"src": b.column("src_host"), "dst": b.column("dst_host")}
        ),
        batch_format="pyarrow",
    )
    return min_hops_closure(pairs, max_hops=PATH_MAX_HOPS)


def sql_host_reachability() -> str:
    return (
        f"WITH RECURSIVE l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t\n"
        f"  WHERE doc_id % {PATH_DOC_MOD} = 0),\n"
        f"e AS (\n"
        f"  SELECT DISTINCT\n"
        f"    'host' || CAST(sb AS VARCHAR) || '.example.com' AS src,\n"
        f"    'host' || CAST(db AS VARCHAR) || '.example.com' AS dst\n"
        f"  FROM l WHERE sb <> db),\n"
        f"r AS (\n"
        f"  SELECT src, dst, 1 AS hops FROM e\n"
        f"  UNION\n"
        f"  SELECT r.src, e.dst, r.hops + 1 FROM r JOIN e ON r.dst = e.src\n"
        f"  WHERE r.hops < {PATH_MAX_HOPS})\n"
        f"SELECT src, dst, CAST(min(hops) AS BIGINT) AS min_hops\n"
        f"FROM r GROUP BY src, dst"
    )


_COMENTION_CACHE_VERSION = "v1"


def comention_pairs_cached(sf_dir: str):
    """Write-once ``^SYSTEM/(OPERATOR|UNIT)`` affinity pair set shared by
    its consumer family (kg_path_affinity, kg_construct_comention,
    kg_pair_negatives): the path join over the mention stream is the
    expensive part and is identical in all three, so it runs ONCE and the
    (src, dst) result — entity-pair bounded, tiny — persists to parquet.
    Same crash-safe fingerprint-keyed pattern as
    annotated_documents_cached."""
    import shutil

    import ray.data as rd

    from ..stages.paths import eval_path

    d = (
        "/tmp/quickner_ray_compairs_"
        f"{_corpus_cache_key(sf_dir, _COMENTION_CACHE_VERSION)}"
    )
    done = d + ".done"
    if not os.path.exists(done):
        expr = (
            "seq",
            ("inv", ("pred", "SYSTEM")),
            ("alt", ("pred", "OPERATOR"), ("pred", "UNIT")),
        )
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        eval_path(q_triples(sf_dir), expr).write_parquet(tmp)
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        with open(done, "w") as f:
            f.write("ok\n")
    return rd.read_parquet(d)


def q_kg_path_affinity(sf_dir: str):
    """SPARQL property path over the extracted KG:
    ``^SYSTEM / (OPERATOR | UNIT)`` — from a SYSTEM entity, walk the
    inverse mention edge back to its documents, then forward along an
    OPERATOR or UNIT mention: the DISTINCT (system entity, co-mentioned
    entity) affinity pairs. Exercises inv/seq/alt of stages/paths.eval_path
    (one bucketed hash join on the shared doc midpoint; alternation is a
    zero-shuffle union); the pair set is computed once and shared with
    the downstream construct/negatives consumers
    (comention_pairs_cached)."""
    return comention_pairs_cached(sf_dir)


def q_kg_path_affinity_indexed(sf_dir: str):
    """The same ^SYSTEM/(OPERATOR|UNIT) property path as
    ``kg_path_affinity``, evaluated AGAINST THE PERMUTATION-INDEX STORE:
    each predicate step reads only the POS-index fragments whose
    row-group stats admit that predicate (sinks/triplestore.lookup via
    eval_path's ``pred_source`` hook) — the index-pruned navigation a
    100 TB KG serves from. Must answer identically to the stream
    evaluation (same oracle)."""
    from ..sinks.triplestore import lookup
    from ..stages.paths import eval_path

    store = _pos_triple_store(sf_dir)
    expr = (
        "seq",
        ("inv", ("pred", "SYSTEM")),
        ("alt", ("pred", "OPERATOR"), ("pred", "UNIT")),
    )
    return eval_path(
        None, expr, pred_source=lambda label: lookup(store, "pred", label)
    )


def sql_kg_path_affinity() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"sys AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS src\n"
        f"        FROM acc WHERE plabel = 'SYSTEM'),\n"
        f"oth AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS dst\n"
        f"        FROM acc WHERE plabel IN ('OPERATOR', 'UNIT'))\n"
        f"SELECT DISTINCT src, dst FROM sys JOIN oth USING (d)"
    )


def q_host_cheapest_route(sf_dir: str):
    """Weighted property paths over the sparse host graph: minimum total
    link-count cost over directed routes of 1..3 hops (hop-bounded
    Bellman-Ford, stages/paths.cheapest_paths — pair-bounded state, one
    bucketed join + groupby-min per round above the size gate). Edge
    weight = n_links between the host pair, recovered from raw HTML on
    the Ray side and regenerated arithmetically in the oracle."""
    from ..stages.linkgraph import host_link_graph
    from ..stages.paths import cheapest_paths

    edges = host_link_graph(_linked_pages(sf_dir, mod=PATH_DOC_MOD))
    pairs = edges.map_batches(
        lambda b: pa.table(
            {"src": b.column("src_host"), "dst": b.column("dst_host"),
             "w": b.column("n_links")}
        ),
        batch_format="pyarrow",
    )
    return cheapest_paths(pairs, max_hops=PATH_MAX_HOPS)


def sql_host_cheapest_route() -> str:
    return (
        f"WITH RECURSIVE l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t\n"
        f"  WHERE doc_id % {PATH_DOC_MOD} = 0),\n"
        f"e AS (\n"
        f"  SELECT 'host' || CAST(sb AS VARCHAR) || '.example.com' AS src,\n"
        f"         'host' || CAST(db AS VARCHAR) || '.example.com' AS dst,\n"
        f"         CAST(count(*) AS BIGINT) AS w\n"
        f"  FROM l WHERE sb <> db GROUP BY sb, db),\n"
        f"r AS (\n"
        f"  SELECT src, dst, w AS cost, 1 AS hops FROM e\n"
        f"  UNION\n"
        f"  SELECT r.src, e.dst, r.cost + e.w, r.hops + 1\n"
        f"  FROM r JOIN e ON r.dst = e.src WHERE r.hops < {PATH_MAX_HOPS})\n"
        f"SELECT src, dst, CAST(min(cost) AS BIGINT) AS min_cost\n"
        f"FROM r GROUP BY src, dst"
    )


def q_kg_sparql_select(sf_dir: str):
    """The KG queried through actual SPARQL text (kernel/sparql.py mini
    front-end -> bgp_match): docs mentioning the SYSTEM entity 'spark'
    and an OPERATOR, optionally their UNIT, excluding docs that mention
    the PHRASE entity. Same engine as the kg_*_bgp family underneath;
    this pins the parser's round-trip from query text to bindings."""
    from ..kernel.sparql import run_select
    from ..stages.canonicalize import entity_id

    spark = entity_id("spark", "SYSTEM")
    query = f"""
      SELECT ?doc ?op ?u WHERE {{   # served SPARQL surface
        ?doc :SYSTEM :{spark} .
        ?doc :OPERATOR ?op .
        OPTIONAL {{ ?doc :UNIT ?u . }}
        FILTER NOT EXISTS {{ ?doc :PHRASE ?ph . }}
      }}
    """
    return run_select(q_triples(sf_dir), query)


def sql_kg_sparql_select() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    spark = entity_id("spark", "SYSTEM")
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"b AS (SELECT DISTINCT CAST(s.doc_id AS VARCHAR) AS doc, o.eid AS op\n"
        f"  FROM acc s JOIN acc o ON s.doc_id = o.doc_id\n"
        f"  WHERE s.plabel = 'SYSTEM' AND s.eid = '{spark}'\n"
        f"    AND o.plabel = 'OPERATOR'\n"
        f"    AND NOT EXISTS (SELECT 1 FROM acc p\n"
        f"      WHERE p.doc_id = s.doc_id AND p.plabel = 'PHRASE'))\n"
        f"SELECT DISTINCT b.doc, b.op, COALESCE(u.eid, '') AS u\n"
        f"FROM b LEFT JOIN (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc,\n"
        f"    eid FROM acc WHERE plabel = 'UNIT') u ON u.doc = b.doc"
    )


def q_kg_sparql_path(sf_dir: str):
    """A property path written IN the SPARQL text
    (``?s ^:SYSTEM/:OPERATOR|^:SYSTEM/:UNIT ?x``): the parser compiles
    the predicate-position path to the eval_path algebra and bgp_match
    folds its binding pairs like any pattern — query-language parity for
    the whole navigation engine, answer identical to kg_path_affinity
    modulo variable names."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?s ?x WHERE { ?s ^:SYSTEM/:OPERATOR|^:SYSTEM/:UNIT ?x . }",
    )


def sql_kg_sparql_path() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"sys AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS s\n"
        f"        FROM acc WHERE plabel = 'SYSTEM'),\n"
        f"oth AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS x\n"
        f"        FROM acc WHERE plabel IN ('OPERATOR', 'UNIT'))\n"
        f"SELECT DISTINCT s, x FROM sys JOIN oth USING (d)"
    )


def q_kg_sparql_star(sf_dir: str):
    """SPARQL 1.1 zero-or-more property path with grouping parens,
    written in query text: ``?a (^:SYSTEM/:SYSTEM)*2 ?b`` — entities
    within two co-mention hops of each other on the SYSTEM layer, PLUS
    the zero-length identity over every graph term (SPARQL's ``*``
    relates each term to itself). The parser re-joins the
    tokenizer-split parens, compiles to the ("star", seq, 2) algebra
    node, and eval_path unions the hop-bounded closure with one
    zero-shuffle identity projection pass (stages/paths.py)."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?a ?b WHERE { ?a (^:SYSTEM/:SYSTEM)*2 ?b . }",
    )


def sql_kg_sparql_star() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"sys AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS e\n"
        f"        FROM acc WHERE plabel = 'SYSTEM'),\n"
        f"s1 AS (SELECT DISTINCT a.e AS src, b.e AS dst\n"
        f"       FROM sys a JOIN sys b ON a.d = b.d),\n"
        f"s2 AS (SELECT DISTINCT x.src, y.dst\n"
        f"       FROM s1 x JOIN s1 y ON x.dst = y.src),\n"
        f"univ AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS n FROM acc\n"
        f"         UNION SELECT DISTINCT eid FROM acc)\n"
        f"SELECT DISTINCT a, b FROM (\n"
        f"  SELECT n AS a, n AS b FROM univ\n"
        f"  UNION ALL SELECT src, dst FROM s1\n"
        f"  UNION ALL SELECT src, dst FROM s2)"
    )


def q_kg_sparql_negpath(sf_dir: str):
    """SPARQL 1.1 negated property set under a zero-or-one postfix,
    written in query text: ``?d (!(:SYSTEM|:OPERATOR))? ?x`` — every
    (doc, entity) edge whose predicate is NOT one of the named labels
    (one vectorized complement filter; the step shape no per-predicate
    index can serve, so it scans the stream by design), unioned with
    the zero-length identity over every graph term."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?d ?x WHERE { ?d (!(:SYSTEM|:OPERATOR))? ?x . }",
    )


def sql_kg_sparql_negpath() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"neg AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS x\n"
        f"        FROM acc WHERE plabel NOT IN ('SYSTEM', 'OPERATOR')),\n"
        f"univ AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS n FROM acc\n"
        f"         UNION SELECT DISTINCT eid FROM acc)\n"
        f"SELECT DISTINCT d, x FROM (\n"
        f"  SELECT n AS d, n AS x FROM univ\n"
        f"  UNION ALL SELECT d, x FROM neg)"
    )


def q_kg_sparql_agg(sf_dir: str):
    """SPARQL 1.1 aggregation written in query text: per SYSTEM entity,
    COUNT(DISTINCT ?d) co-mentioning docs and COUNT(?o) distinct
    (doc, operator) solutions, GROUP BY + ORDER BY through the
    kernel/sparql front-end (each aggregate one bounded groupby; no
    Dataset.schema() round-trips — bound variables are derived from the
    query text)."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?s (COUNT(DISTINCT ?d) AS ?n_docs) (COUNT(?o) AS ?n_sol) "
        "WHERE { ?d :SYSTEM ?s . ?d :OPERATOR ?o . } GROUP BY ?s",
    )


def sql_kg_sparql_agg() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"b AS (SELECT DISTINCT CAST(s.doc_id AS VARCHAR) AS d,\n"
        f"             s.eid AS s, o.eid AS o\n"
        f"      FROM acc s JOIN acc o ON s.doc_id = o.doc_id\n"
        f"      WHERE s.plabel = 'SYSTEM' AND o.plabel = 'OPERATOR')\n"
        f"SELECT s, CAST(count(DISTINCT d) AS BIGINT) AS n_docs,\n"
        f"       CAST(count(*) AS BIGINT) AS n_sol\n"
        f"FROM b GROUP BY s"
    )


def q_kg_sparql_construct(sf_dir: str):
    """SPARQL CONSTRUCT written in query text: materialize CO_MENTIONED
    triples from a property-path pattern — each template is a
    zero-shuffle projection of the binding stream, one bounded groupby
    dedups (kernel/sparql.run_construct)."""
    from ..kernel.sparql import run_construct

    return run_construct(
        q_triples(sf_dir),
        "CONSTRUCT { ?s :CO_MENTIONED ?x . } "
        "WHERE { ?s ^:SYSTEM/:OPERATOR|^:SYSTEM/:UNIT ?x . }",
    )


def sql_kg_sparql_construct() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"sys AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid\n"
        f"        FROM acc WHERE plabel = 'SYSTEM'),\n"
        f"oth AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid\n"
        f"        FROM acc WHERE plabel IN ('OPERATOR', 'UNIT'))\n"
        f"SELECT DISTINCT sys.eid AS subj, 'CO_MENTIONED' AS pred,\n"
        f"       oth.eid AS obj FROM sys JOIN oth USING (d)"
    )


def q_kg_sparql_ask(sf_dir: str):
    """SPARQL ASK written in query text: is any document mentioning the
    SYSTEM entity 'spark' also carrying a PHRASE mention? One-row 0/1
    answer; the binding stream short-circuits at the first hit
    (kernel/sparql.run_ask)."""
    from ..kernel.sparql import run_ask
    from ..stages.canonicalize import entity_id

    spark = entity_id("spark", "SYSTEM")
    return run_ask(
        q_triples(sf_dir),
        f"ASK {{ ?d :SYSTEM :{spark} . ?d :PHRASE ?p . }}",
    )


def sql_kg_sparql_ask() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    spark = entity_id("spark", "SYSTEM")
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        f"SELECT CAST(CASE WHEN EXISTS (\n"
        f"  SELECT 1 FROM acc s JOIN acc p ON s.doc_id = p.doc_id\n"
        f"  WHERE s.plabel = 'SYSTEM' AND s.eid = '{spark}'\n"
        f"    AND p.plabel = 'PHRASE') THEN 1 ELSE 0 END AS BIGINT) AS ask"
    )


def q_kg_sparql_describe(sf_dir: str):
    """SPARQL DESCRIBE for the canonical 'spark' SYSTEM entity: every
    distinct triple touching it, one vectorized filter pass over the
    stream (kernel/sparql.run_describe). Output also exercises the
    VALUES verb indirectly via the oracle's constant restriction."""
    from ..kernel.sparql import run_describe
    from ..stages.canonicalize import entity_id

    spark = entity_id("spark", "SYSTEM")
    return run_describe(q_triples(sf_dir), f"DESCRIBE :{spark}")


def sql_kg_sparql_describe() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    spark = entity_id("spark", "SYSTEM")
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        f"SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj, plabel AS pred,\n"
        f"       eid AS obj FROM acc WHERE eid = '{spark}'"
    )


def q_kg_sparql_values(sf_dir: str):
    """SPARQL VALUES inline restriction in query text: co-mention pairs
    with the SYSTEM side pinned to the 'spark'/'stream' entities via a
    VALUES row (vectorized is_in over the binding stream)."""
    from ..kernel.sparql import run_select
    from ..stages.canonicalize import entity_id

    spark = entity_id("spark", "SYSTEM")
    stream = entity_id("stream", "SYSTEM")
    return run_select(
        q_triples(sf_dir),
        f"SELECT ?s ?o WHERE {{ ?d :SYSTEM ?s . ?d :OPERATOR ?o . "
        f"VALUES ?s {{ :{spark} :{stream} }} }}",
    )


def sql_kg_sparql_values() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    spark = entity_id("spark", "SYSTEM")
    stream = entity_id("stream", "SYSTEM")
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        f"SELECT DISTINCT s.eid AS s, o.eid AS o\n"
        f"FROM acc s JOIN acc o ON s.doc_id = o.doc_id\n"
        f"WHERE s.plabel = 'SYSTEM' AND o.plabel = 'OPERATOR'\n"
        f"  AND s.eid IN ('{spark}', '{stream}')"
    )


def q_kg_sparql_union(sf_dir: str):
    """SPARQL UNION in query text: (doc, entity) bindings from OPERATOR
    or UNIT mentions — branch evaluations are a zero-shuffle Dataset
    union, one bounded groupby dedups across branches
    (kernel/sparql._bindings)."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?d ?e WHERE { { ?d :OPERATOR ?e . } "
        "UNION { ?d :UNIT ?e . } }",
    )


def sql_kg_sparql_union() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        f"SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS e\n"
        f"FROM acc WHERE plabel IN ('OPERATOR', 'UNIT')"
    )


def q_kg_sparql_filter(sf_dir: str):
    """SPARQL FILTER expressions in query text: SYSTEM-mentioning docs
    whose doc id starts with '1' and whose system entity is NOT the
    'stream' one — regex + inequality filters as vectorized Arrow masks
    over the binding stream (kernel/sparql._bindings)."""
    from ..kernel.sparql import run_select
    from ..stages.canonicalize import entity_id

    stream = entity_id("stream", "SYSTEM")
    return run_select(
        q_triples(sf_dir),
        f'SELECT ?d ?s WHERE {{ ?d :SYSTEM ?s . '
        f'FILTER regex(?d, "^1") FILTER ( ?s != :{stream} ) }}',
    )


def sql_kg_sparql_filter() -> str:
    from ..stages.canonicalize import entity_id
    from .ner_oracle import sql_match_ctes

    stream = entity_id("stream", "SYSTEM")
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        f"SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS s\n"
        f"FROM acc WHERE plabel = 'SYSTEM'\n"
        f"  AND regexp_matches(CAST(doc_id AS VARCHAR), '^1')\n"
        f"  AND eid <> '{stream}'"
    )


def q_kg_sparql_having(sf_dir: str):
    """SPARQL 1.1 HAVING in query text: docs co-mentioning MORE THAN TWO
    distinct OPERATOR entities, with the count projected. The group
    filter reuses the SELECT aggregate's column — one vectorized mask
    pass after the bounded groupby (kernel/sparql.run_select)."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?d (COUNT(?o) AS ?n_ops) WHERE { ?d :OPERATOR ?o . } "
        "GROUP BY ?d HAVING ( COUNT ( ?o ) > 2 )",
    )


def sql_kg_sparql_having() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "b AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS o\n"
        "      FROM acc WHERE plabel = 'OPERATOR')\n"
        "SELECT d, CAST(count(*) AS BIGINT) AS n_ops FROM b\n"
        "GROUP BY d HAVING count(*) > 2"
    )


def q_kg_sparql_slice(sf_dir: str):
    """SPARQL numeric FILTER + ORDER BY + OFFSET/LIMIT paging in query
    text: SYSTEM bindings for docs whose id is numerically < 3000,
    sorted on both variables (a unique key, so the page is
    deterministic), skipping the first 10 rows and keeping 40. OFFSET
    rides split_at_indices over the sorted stream; the parser refuses
    OFFSET without ORDER BY."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?d ?s WHERE { ?d :SYSTEM ?s . FILTER ( ?d < 3000 ) } "
        "ORDER BY ?d ?s LIMIT 40 OFFSET 10",
    )


def sql_kg_sparql_slice() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "b AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS s\n"
        "      FROM acc WHERE plabel = 'SYSTEM'\n"
        "        AND CAST(doc_id AS DOUBLE) < 3000)\n"
        "SELECT d, s FROM b ORDER BY d, s LIMIT 40 OFFSET 10"
    )


def q_kg_sparql_rollup(sf_dir: str):
    """The full SPARQL 1.1 aggregate set in one query-text rollup: per
    SYSTEM entity, COUNT / MIN / MAX / SUM / AVG / SAMPLE /
    GROUP_CONCAT over the mentioning doc ids (doc ids are numeric
    strings, so SUM/AVG exercise the exact-int64 cast path and AVG the
    float64-quotient-of-exact-ints contract). Each aggregate is one
    partial-combined bounded groupby; the alias columns fold with
    bucketed hash joins on the entity key (kernel/sparql._agg_one).
    Determinism pins that make this value-oracle-able: SAMPLE == MIN,
    GROUP_CONCAT joins ascending-sorted."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?s (COUNT(?d) AS ?n_docs) (MIN(?d) AS ?first_doc) "
        "(MAX(?d) AS ?last_doc) (SUM(?d) AS ?sum_doc) "
        "(AVG(?d) AS ?avg_doc) (SAMPLE(?d) AS ?pick_doc) "
        '(GROUP_CONCAT(?d ; SEPARATOR= "|") AS ?docs) '
        "WHERE { ?d :SYSTEM ?s . } GROUP BY ?s",
    )


def sql_kg_sparql_rollup() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "b AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS s\n"
        "      FROM acc WHERE plabel = 'SYSTEM')\n"
        "SELECT s, CAST(count(*) AS BIGINT) AS n_docs,\n"
        "       min(d) AS first_doc, max(d) AS last_doc,\n"
        "       CAST(sum(CAST(d AS BIGINT)) AS BIGINT) AS sum_doc,\n"
        "       CAST(sum(CAST(d AS BIGINT)) AS DOUBLE) / count(*)\n"
        "         AS avg_doc,\n"
        "       min(d) AS pick_doc,\n"
        "       string_agg(d, '|' ORDER BY d) AS docs\n"
        "FROM b GROUP BY s"
    )


def q_kg_sparql_bind(sf_dir: str):
    """BIND value expressions + the FILTER expression grammar in query
    text: a CONCAT-derived tag column plus a boolean-combinator filter
    (strStarts || numeric STRLEN comparison). BIND is one zero-shuffle
    append_column pass over the binding stream; the filter one vectorized
    mask pass (kernel/sparql._eval_vexpr/_eval_bexpr)."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        'SELECT ?d ?s ?tag WHERE { ?d :SYSTEM ?s . '
        'BIND ( CONCAT(?s, "@", ?d) AS ?tag ) '
        'FILTER ( strStarts(?d, "1") || STRLEN(?d) <= 3 ) }',
    )


def sql_kg_sparql_bind() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "b AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS s\n"
        "      FROM acc WHERE plabel = 'SYSTEM')\n"
        "SELECT d, s, s || '@' || d AS tag FROM b\n"
        "WHERE d LIKE '1%' OR length(d) <= 3"
    )


def quads_dataset(sf_dir: str):
    """Mention triples widened to QUADS: graph = the mention document's
    ``source`` (the named-graph provenance model — each upstream feed its
    own graph). The doc->source map is read column-pruned and broadcast
    ONCE via ray.put (plasma, zero-copy per batch); the graph column is
    one vectorized index_in/take append. At open-web scale the graph
    label rides the extraction row itself (it is a source-table column,
    like warc metadata) — the broadcast here stands in because the
    annotated cache predates the quad model."""
    import ray
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )
    ref = ray.put(
        (
            t.column("doc_id").cast(pa.string()).combine_chunks(),
            t.column("source").combine_chunks(),
        )
    )

    def add(b: pa.Table, r=ref) -> pa.Table:
        ids, srcs = ray.get(r)
        idx = pc.index_in(b.column("subj"), value_set=ids)
        return b.append_column("graph", pc.take(srcs, idx))

    return q_triples(sf_dir).map_batches(add, batch_format="pyarrow")


def q_kg_graph_bgp(sf_dir: str):
    """Named-graph SPARQL over the quad stream: per provenance graph
    (document source), the distinct docs mentioning a SYSTEM entity —
    ``GRAPH ?g { ... }`` binds the graph term as a 4th pattern column and
    the aggregation groups on it. Quad patterns ride the same vectorized
    mask/join machinery as triples (stages/bgp 4-term patterns)."""
    from ..kernel.sparql import run_select

    return run_select(
        quads_dataset(sf_dir),
        "SELECT ?g (COUNT(DISTINCT ?d) AS ?n_docs) WHERE { "
        "GRAPH ?g { ?d :SYSTEM ?s . } } GROUP BY ?g",
    )


def sql_kg_graph_bgp() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        "SELECT d.source AS g,\n"
        "       CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_docs\n"
        "FROM acc a JOIN documents d ON a.doc_id = d.doc_id\n"
        "WHERE a.plabel = 'SYSTEM' GROUP BY d.source"
    )


def q_kg_graph_scoped(sf_dir: str):
    """Constant-graph restriction: the SYSTEM x OPERATOR co-mention BGP
    evaluated INSIDE one provenance graph (``GRAPH :src3 { ... }``) —
    both patterns carry the graph constant, so the vectorized masks drop
    every other source before the join."""
    from ..kernel.sparql import run_select

    return run_select(
        quads_dataset(sf_dir),
        "SELECT ?d ?s ?op WHERE { GRAPH :src3 { "
        "?d :SYSTEM ?s . ?d :OPERATOR ?op . } }",
    )


def sql_kg_graph_scoped() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        "SELECT DISTINCT CAST(s.doc_id AS VARCHAR) AS d, s.eid AS s,\n"
        "       o.eid AS op\n"
        "FROM acc s JOIN acc o ON s.doc_id = o.doc_id\n"
        "JOIN documents dd ON s.doc_id = dd.doc_id\n"
        "WHERE s.plabel = 'SYSTEM' AND o.plabel = 'OPERATOR'\n"
        "  AND dd.source = 'src3'"
    )


def q_kg_sparql_served(sf_dir: str):
    """The kg_sparql_select query TEXT served from the permutation store
    (quickner_ray.serving.sparql_select): bound-predicate patterns read
    via POS-index lookups, the fold order comes from the store synopsis
    (plan='stats', zero scans to plan) — the deployed-endpoint
    composition, answer-identical to the stream evaluation (same
    oracle)."""
    from ..serving import sparql_select
    from ..stages.canonicalize import entity_id

    store = _full_triple_store(sf_dir)
    spark = entity_id("spark", "SYSTEM")
    return sparql_select(
        store,
        f"""
        SELECT ?doc ?op ?u WHERE {{
          ?doc :SYSTEM :{spark} .
          ?doc :OPERATOR ?op .
          OPTIONAL {{ ?doc :UNIT ?u . }}
          FILTER NOT EXISTS {{ ?doc :PHRASE ?ph . }}
        }}
        """,
    )


def sql_kg_sparql_served() -> str:
    return sql_kg_sparql_select()


def q_kg_describe_served(sf_dir: str):
    """DESCRIBE served from the store: two point lookups (SPO for the
    subject side, OSP for the object side — each reads only admitting
    fragments) instead of the stream scan run_describe performs. Same
    oracle as kg_sparql_describe."""
    from ..serving import sparql_describe
    from ..stages.canonicalize import entity_id

    store = _full_triple_store(sf_dir)
    spark = entity_id("spark", "SYSTEM")
    return sparql_describe(store, f"DESCRIBE :{spark}")


def sql_kg_describe_served() -> str:
    return sql_kg_sparql_describe()


def q_kg_sparql_subquery(sf_dir: str):
    """SPARQL 1.1 subquery in query text: the inner SELECT computes each
    SYSTEM entity's distinct-doc mention count independently (one bounded
    groupby), re-enters the binding model as string terms, joins the
    outer mention pattern on the shared ?s, and a numeric FILTER keeps
    widely-mentioned systems — the aggregate-then-join shape SPARQL can
    only express with a subquery."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?d ?s ?n WHERE { ?d :SYSTEM ?s . "
        "{ SELECT ?s (COUNT(DISTINCT ?x) AS ?n) "
        "WHERE { ?x :SYSTEM ?s . } GROUP BY ?s } "
        "FILTER ( ?n >= 100 ) }",
    )


def sql_kg_sparql_subquery() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "b AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid AS s\n"
        "      FROM acc WHERE plabel = 'SYSTEM'),\n"
        "c AS (SELECT s, CAST(count(*) AS VARCHAR) AS n FROM b GROUP BY s)\n"
        "SELECT b.d, b.s, c.n FROM b JOIN c USING (s)\n"
        "WHERE CAST(c.n AS BIGINT) >= 100"
    )


def q_kg_sparql_exists(sf_dir: str):
    """SPARQL FILTER EXISTS in query text: SYSTEM bindings kept only for
    docs that ALSO mention a UNIT entity — one bucketed left-SEMI join on
    the shared doc variable (the positive twin of the NOT EXISTS
    anti-join); the UNIT variable never joins the output."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT ?d ?s WHERE { ?d :SYSTEM ?s . "
        "FILTER EXISTS { ?d :UNIT ?u . } }",
    )


def sql_kg_sparql_exists() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        "SELECT DISTINCT CAST(s.doc_id AS VARCHAR) AS d, s.eid AS s\n"
        "FROM acc s WHERE s.plabel = 'SYSTEM'\n"
        "  AND EXISTS (SELECT 1 FROM acc u\n"
        "              WHERE u.doc_id = s.doc_id AND u.plabel = 'UNIT')"
    )


def q_kg_sparql_global(sf_dir: str):
    """Implicit single-group SPARQL aggregation (no GROUP BY): whole-KG
    statistics in one query-text call — solution count, distinct docs,
    distinct entities, lexicographic first entity — over the fully
    unbound pattern ``?d ?p ?e``. Each aggregate partial-combines per
    batch and finishes with one global tree-reduce; the result is a
    single row (kernel/sparql._aggregate_global)."""
    from ..kernel.sparql import run_select

    return run_select(
        q_triples(sf_dir),
        "SELECT (COUNT(?d) AS ?n_sol) (COUNT(DISTINCT ?d) AS ?n_docs) "
        "(COUNT(DISTINCT ?e) AS ?n_entities) (MIN(?e) AS ?first_entity) "
        "WHERE { ?d ?p ?e . }",
    )


def sql_kg_sparql_global() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "t AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d,\n"
        "             plabel AS p, eid AS e FROM acc)\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_sol,\n"
        "       CAST(count(DISTINCT d) AS BIGINT) AS n_docs,\n"
        "       CAST(count(DISTINCT e) AS BIGINT) AS n_entities,\n"
        "       min(e) AS first_entity\n"
        "FROM t"
    )


def q_kg_owl_inverse(sf_dir: str):
    """OWL-lite axiom materialization over the constructed KG:
    ``MENTIONS_SYSTEM owl:inverseOf SYSTEM_OF`` — every (doc, SYSTEM,
    entity) triple also materializes (entity, SYSTEM_OF, doc), alongside
    the original stream, globally DISTINCT. One zero-shuffle arm pass +
    one bounded dedup groupby (stages/owl.materialize_property_axioms)."""
    from ..stages.owl import OwlSchema, materialize_property_axioms

    return materialize_property_axioms(
        q_triples(sf_dir), OwlSchema(inverse_of=(("SYSTEM", "SYSTEM_OF"),))
    )


def sql_kg_owl_inverse() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "t AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj,\n"
        "             plabel AS pred, eid AS obj FROM acc)\n"
        "SELECT DISTINCT subj, pred, obj FROM (\n"
        "  SELECT subj, pred, obj FROM t\n"
        "  UNION ALL\n"
        "  SELECT obj AS subj, 'SYSTEM_OF' AS pred, subj AS obj FROM t\n"
        "  WHERE pred = 'SYSTEM')"
    )


def q_kg_functional_violations(sf_dir: str):
    """owl:FunctionalProperty integrity over the KG: declaring SYSTEM
    functional (one system entity per doc), report every doc that
    violates it with its distinct-object count — the KG-quality gate a
    construction pipeline runs before serving. In-batch pre-dedup + two
    bounded groupbys (stages/owl.functional_violations)."""
    from ..stages.owl import OwlSchema, functional_violations

    return functional_violations(
        q_triples(sf_dir), OwlSchema(functional=("SYSTEM",))
    )


def sql_kg_functional_violations() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        "SELECT CAST(doc_id AS VARCHAR) AS subj, 'SYSTEM' AS pred,\n"
        "       CAST(count(DISTINCT eid) AS BIGINT) AS n_objects\n"
        "FROM acc WHERE plabel = 'SYSTEM'\n"
        "GROUP BY doc_id HAVING count(DISTINCT eid) > 1"
    )


def q_kg_ifp_signals(sf_dir: str):
    """owl:InverseFunctionalProperty merge signals: declaring OPERATOR
    inverse-functional (an operator entity identifies its doc), every
    OPERATOR entity mentioned by MORE than one doc is an
    entity-resolution merge candidate set (obj, pred, n_subjects).
    Linear — the quadratic sameAs pair emission stays behind
    stages/owl.ifp_sameas_pairs's cap."""
    from ..stages.owl import OwlSchema, ifp_merge_signals

    return ifp_merge_signals(
        q_triples(sf_dir), OwlSchema(inverse_functional=("OPERATOR",))
    )


def sql_kg_ifp_signals() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)}\n"
        "SELECT eid AS obj, 'OPERATOR' AS pred,\n"
        "       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_subjects\n"
        "FROM acc WHERE plabel = 'OPERATOR'\n"
        "GROUP BY eid HAVING count(DISTINCT doc_id) > 1"
    )


def q_kg_system_profile(sf_dir: str):
    """SPARQL-style aggregation over BGP bindings (GROUP BY after the
    graph pattern): for each SYSTEM entity, the number of distinct
    documents that mention it together with an OPERATOR, and the number
    of distinct OPERATOR entities it co-occurs with. Every groupby here
    is gazetteer-bounded (entity vocabulary, not corpus rows), so the
    aggregation costs nothing next to the mention scan."""
    from ray.data.aggregate import Count

    from ..stages.bgp import bgp_match
    from ..stages.hashjoin import bucketed_join

    # materialized: both count-distinct branches consume the bindings, and
    # the set is distinct (doc, system, operator) tuples — mention-bounded,
    # far smaller than re-running the NER scan + join per branch
    bindings = bgp_match(
        q_triples(sf_dir), [("?d", "SYSTEM", "?s"), ("?d", "OPERATOR", "?o")]
    ).materialize()

    def count_distinct(pair_col: str, alias: str):
        pairs = bindings.map_batches(
            lambda b, c=pair_col: pa.table(
                {"s": b.column("s"), c: b.column(c)}
            ).group_by(["s", c]).aggregate([]),
            batch_format="pyarrow",
        )
        return (
            pairs.groupby(["s", pair_col])
            .aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
            .groupby("s")
            .aggregate(Count(alias_name=alias))
        )

    return bucketed_join(
        count_distinct("d", "n_docs"),
        count_distinct("o", "n_operators"),
        on=("s",),
        n_buckets=8,
        left_types={"s": pa.string(), "n_docs": pa.int64()},
        right_types={"s": pa.string(), "n_operators": pa.int64()},
    )


def sql_kg_system_profile() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"b AS (SELECT DISTINCT CAST(s.doc_id AS VARCHAR) AS d,\n"
        f"             s.eid AS s, o.eid AS o\n"
        f"      FROM acc s JOIN acc o ON s.doc_id = o.doc_id\n"
        f"      WHERE s.plabel = 'SYSTEM' AND o.plabel = 'OPERATOR')\n"
        f"SELECT s, CAST(count(DISTINCT d) AS BIGINT) AS n_docs,\n"
        f"       CAST(count(DISTINCT o) AS BIGINT) AS n_operators\n"
        f"FROM b GROUP BY s"
    )


def q_kg_construct_comention(sf_dir: str):
    """SPARQL CONSTRUCT closing the KG-construction loop: materialize new
    ``CO_MENTIONED`` triples from the ^SYSTEM/(OPERATOR|UNIT) path
    bindings (q_kg_path_affinity), union them with the extracted mention
    triples, and profile the enriched graph — distinct (subj, obj) edge
    count per predicate. The constructed side is entity-pair bounded; the
    union is a zero-shuffle concat feeding one dimension-bounded groupby."""
    from ray.data.aggregate import Count

    base = q_triples(sf_dir).map_batches(
        lambda b: pa.table(
            {"subj": b.column("subj"), "pred": b.column("pred"),
             "obj": b.column("obj")}
        ).group_by(["subj", "pred", "obj"]).aggregate([]),
        batch_format="pyarrow",
    )
    constructed = comention_pairs_cached(sf_dir).map_batches(
        lambda b: pa.table(
            {
                "subj": b.column("src"),
                "pred": pa.array(["CO_MENTIONED"] * b.num_rows),
                "obj": b.column("dst"),
            }
        ),
        batch_format="pyarrow",
    )
    return (
        base.union(constructed)
        .groupby(["subj", "pred", "obj"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .groupby("pred")
        .aggregate(Count(alias_name="n_edges"))
    )


def sql_kg_construct_comention() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"base AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS subj,\n"
        f"                plabel AS pred, eid AS obj FROM acc),\n"
        f"sys AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid\n"
        f"        FROM acc WHERE plabel = 'SYSTEM'),\n"
        f"oth AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d, eid\n"
        f"        FROM acc WHERE plabel IN ('OPERATOR', 'UNIT')),\n"
        f"built AS (SELECT DISTINCT sys.eid AS subj, 'CO_MENTIONED' AS pred,\n"
        f"                 oth.eid AS obj FROM sys JOIN oth USING (d)),\n"
        f"u AS (SELECT * FROM base UNION SELECT * FROM built)\n"
        f"SELECT pred, CAST(count(*) AS BIGINT) AS n_edges FROM u GROUP BY pred"
    )


def q_kg_pair_negatives(sf_dir: str):
    """Pair-level KG-embedding negatives (TransE-style tail corruption,
    Bordes et al. 2013) over the co-mention EDGE set — complements the
    existing mention-level ``kg_negative_samples``: for each positive
    (SYSTEM entity, co-mentioned entity) pair, 3 deterministic corrupted
    tails md5-picked from the FULL entity vocabulary (every canonical
    entity in the KG, not just positive tails — co-mention graphs are
    dense enough that tail-only vocabularies leave nothing to corrupt
    with), accidental positives removed by ONE bucketed anti-join
    (stages/negsample.negative_samples — vocabulary broadcast once,
    generation vectorized, positive set never collected)."""
    from ..stages.negsample import negative_samples

    vocab = q_triples(sf_dir).map_batches(
        lambda b: pa.table({"e": b.column("obj")}).group_by(["e"])
        .aggregate([]),
        batch_format="pyarrow",
    )
    # the cached pair parquet is re-read by both consumers of the
    # positives (candidate generation + anti-join side) — no materialize
    return negative_samples(comention_pairs_cached(sf_dir), vocab=vocab, k=3)


def sql_kg_pair_negatives() -> str:
    from ..stages.negsample import sql_negative_samples
    from .ner_oracle import sql_match_ctes

    pairs = (
        "SELECT DISTINCT s.eid AS src, o.eid AS dst\n"
        "  FROM acc s JOIN acc o ON s.doc_id = o.doc_id\n"
        "  WHERE s.plabel = 'SYSTEM' AND o.plabel IN ('OPERATOR', 'UNIT')"
    )
    vocab = "SELECT DISTINCT eid AS e FROM acc"
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"{sql_negative_samples(pairs, sql_vocab=vocab, k=3)}"
    )


def q_kg_pred_cardinality(sf_dir: str, k: int = 64):
    """Per-predicate distinct-subject cardinality synopses over the KG:
    one KMV sketch per predicate (stages/sketch.kmv_estimate_grouped) —
    exact below k distinct docs, Beyer integer estimate above. The
    per-batch partial bounds every predicate's shuffle contribution to k
    rows per block, so the groupby moves sketch-sized data however many
    mentions a hot predicate has — the cardinality-statistics pass a
    query planner or crawl scheduler runs over an unbounded key space."""
    from ..stages.sketch import kmv_estimate_grouped

    rows = q_triples(sf_dir).map_batches(
        lambda b: pa.table({"g": b.column("pred"), "v": b.column("subj")}),
        batch_format="pyarrow",
    )
    return kmv_estimate_grouped(rows, "g", "v", k=k)


def sql_kg_pred_cardinality(k: int = 64) -> str:
    from ..stages.sketch import sql_kmv_estimate_grouped
    from .ner_oracle import sql_match_ctes

    rows = (
        "SELECT plabel AS g, CAST(doc_id AS VARCHAR) AS v FROM acc"
    )
    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"{sql_kmv_estimate_grouped(rows, key='g', k=k)}"
    )


def q_entity_cards(sf_dir: str):
    """Per-entity serving card — the dossier a KG front-end renders: for
    every canonical entity, its label and surface name, mention count,
    distinct-document count, and the top co-mentioned partner entity
    (most shared docs, ties broken by partner id). All aggregates are
    entity-bounded; the partner ranking is the grouped top-1 combiner
    over the co-occurrence edge list (one shuffle each); the final
    assembly is two bucketed hash joins. Partnerless entities keep the
    card with top_partner = '' and 0 shared docs."""
    from ray.data.aggregate import Count, Sum

    from ..stages.graph_cc import cooccurrence_pairs
    from ..stages.hashjoin import bucketed_join
    from ..stages.topk import grouped_topk

    tri = q_triples(sf_dir)

    # meta + mention counts: per-batch combiner -> one bounded groupby
    meta = (
        tri.map_batches(
            lambda b: pa.table(
                {"eid": b.column("obj"), "label": b.column("pred"),
                 "name": b.column("surface_norm")}
            ).group_by(["eid", "label", "name"]).aggregate([([], "count_all")])
            .rename_columns(["eid", "label", "name", "p_n"]),
            batch_format="pyarrow",
        )
        .groupby(["eid", "label", "name"])
        .aggregate(Sum("p_n", alias_name="n_mentions"))
    )

    # distinct-doc counts: batch-local pair dedup -> global dedup -> count
    ndocs = (
        tri.map_batches(
            lambda b: pa.table(
                {"eid": b.column("obj"), "d": b.column("subj")}
            ).group_by(["eid", "d"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["eid", "d"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .groupby("eid")
        .aggregate(Count(alias_name="n_docs"))
    )

    # top partner: direct the undirected co-occurrence edges both ways,
    # grouped top-1 by (shared docs desc, partner asc)
    edges = cooccurrence_pairs(annotated_documents_cached(sf_dir), annotated=True)
    directed = edges.map_batches(
        lambda b: pa.table(
            {
                "eid": pa.concat_arrays(
                    [b.column("entity_a").combine_chunks(),
                     b.column("entity_b").combine_chunks()]
                ),
                "partner": pa.concat_arrays(
                    [b.column("entity_b").combine_chunks(),
                     b.column("entity_a").combine_chunks()]
                ),
                "shared": pa.concat_arrays(
                    [b.column("n_docs").combine_chunks()] * 2
                ),
            }
        ),
        batch_format="pyarrow",
    )
    top = grouped_topk(
        directed, "eid", ["shared", "partner"], 1, descending=[True, False]
    ).map_batches(
        lambda b: pa.table(
            {"eid": b.column("eid"), "top_partner": b.column("partner"),
             "top_partner_docs": b.column("shared")}
        ),
        batch_format="pyarrow",
    )

    card = bucketed_join(
        meta,
        ndocs,
        on=("eid",),
        n_buckets=8,
        left_types={"eid": pa.string(), "label": pa.string(),
                    "name": pa.string(), "n_mentions": pa.int64()},
        right_types={"eid": pa.string(), "n_docs": pa.int64()},
    )
    card = bucketed_join(
        card,
        top,
        on=("eid",),
        n_buckets=8,
        join_type="left outer",
        left_types={"eid": pa.string(), "label": pa.string(),
                    "name": pa.string(), "n_mentions": pa.int64(),
                    "n_docs": pa.int64()},
        right_types={"eid": pa.string(), "top_partner": pa.string(),
                     "top_partner_docs": pa.int64()},
    )
    return card.map_batches(
        lambda b: pa.table(
            {
                "eid": b.column("eid"),
                "label": b.column("label"),
                "name": b.column("name"),
                "n_mentions": b.column("n_mentions"),
                "n_docs": b.column("n_docs"),
                "top_partner": pc.fill_null(b.column("top_partner"), ""),
                "top_partner_docs": pc.fill_null(
                    b.column("top_partner_docs"), 0
                ),
            }
        ),
        batch_format="pyarrow",
    )


def sql_entity_cards() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"stats AS (SELECT eid, plabel AS label, pname AS name,\n"
        f"    CAST(count(*) AS BIGINT) AS n_mentions,\n"
        f"    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs\n"
        f"  FROM acc GROUP BY eid, plabel, pname),\n"
        f"de AS (SELECT DISTINCT doc_id, eid FROM acc),\n"
        f"dcap AS (SELECT doc_id, eid FROM de QUALIFY\n"
        f"  row_number() OVER (PARTITION BY doc_id ORDER BY eid) <= 64),\n"
        f"pairs AS (SELECT a.eid AS eid, b.eid AS partner,\n"
        f"    CAST(count(*) AS BIGINT) AS shared\n"
        f"  FROM dcap a JOIN dcap b ON a.doc_id = b.doc_id AND a.eid <> b.eid\n"
        f"  GROUP BY a.eid, b.eid),\n"
        f"top AS (SELECT eid, partner, shared, row_number() OVER (\n"
        f"    PARTITION BY eid ORDER BY shared DESC, partner) AS rk\n"
        f"  FROM pairs)\n"
        f"SELECT s.eid, s.label, s.name, s.n_mentions, s.n_docs,\n"
        f"  COALESCE(t.partner, '') AS top_partner,\n"
        f"  COALESCE(t.shared, 0) AS top_partner_docs\n"
        f"FROM stats s LEFT JOIN top t ON t.eid = s.eid AND t.rk = 1"
    )


def q_kg_prep_canonical(sf_dir: str):
    """End-to-end corpus-to-KG prep: P1 length filter -> exact content
    dedup (keep the min doc_id per distinct text) -> boundary-rule NER
    over the survivors -> canonical entity table. The whole chain is
    verified by ONE composed SQL oracle, so curation decisions provably
    flow through to the emitted KG (mentions that lived only in dropped
    duplicates leave the table). Shuffles: the dedup groupby (content-hash
    key, uniform by construction) + the canonical aggregate."""
    import numpy as np
    import pyarrow.compute as pc

    from ..kernel.filters import Filters
    from ..kernel.hashing import hash_texts
    from ..stages.canonicalize import canonical_entities
    from ..stages.detect import detect_mentions
    from ..stages.filter_stage import filter_texts

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    ds = filter_texts(ds, Filters(min_length=100, max_length=300))

    def add_hash(b: pa.Table) -> pa.Table:
        t = b.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return b.append_column(
            "text_hash", pa.array(hash_texts(t.to_pylist()), type=pa.string())
        )

    def keep_min(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        i = int(np.argmin(ids.to_numpy(zero_copy_only=False)))
        return group.take(pa.array([i]))

    kept = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(keep_min, batch_format="pyarrow")
        .drop_columns(["text_hash"])
    )
    ann = detect_mentions(kept, documents_gazetteer(), batch_size=2048)
    return canonical_entities(_explode_ann(ann))


def q_kg_negative_samples(sf_dir: str):
    """KG-embedding training negatives: every accepted triple paired with
    a deterministic hash-drawn corrupted object from the occurring entity
    universe (gazetteer-bounded -> one tiny collect + broadcast); the
    corruption pass itself is zero-shuffle."""
    from ..stages.canonicalize import canonical_entities
    from ..stages.relations import kg_negative_samples

    ents = [
        r["entity_id"]
        for r in canonical_entities(mentions_dataset(sf_dir)).take_all()
    ]
    triples = mentions_dataset(sf_dir).map_batches(
        lambda b: add_triple_columns(b, subj_col="doc_id"), batch_format="pyarrow"
    )
    return kg_negative_samples(triples, ents)


def q_entity_random_walks(sf_dir: str):
    """DeepWalk-style KG-embedding training corpus: one deterministic
    hash-seeded random walk (4 steps) per canonical entity over the
    co-occurrence graph (stages/graph_cc.random_walks)."""
    from ..stages.canonicalize import canonical_entities
    from ..stages.graph_cc import _project_t, cooccurrence_pairs, random_walks

    ann = annotated_documents_cached(sf_dir)
    edges = cooccurrence_pairs(ann, annotated=True)
    nodes = _project_t(
        canonical_entities(_explode_ann(ann)),
        {"node": "entity_id"},
        {"node": pa.string()},
    )
    return random_walks(
        edges,
        nodes=nodes,
        src_col="entity_a",
        dst_col="entity_b",
        node_type=pa.string(),
    )


def q_canonical_entities_delta(sf_dir: str):
    """Incremental-KG delta feed: entity-level added/removed/changed/same
    between the even-doc (old) and odd-doc (new) crawls, one pass
    (stages/canonicalize.canonical_entities_delta)."""
    from ..stages.canonicalize import canonical_entities_delta

    return canonical_entities_delta(annotated_documents_cached(sf_dir))


def q_entity_trend(sf_dir: str):
    """Rising/falling entities: exact integer least-squares slope numerator
    of per-snapshot mention counts over 8 derived crawl snapshots
    (stages/canonicalize.entity_trend)."""
    from ..stages.canonicalize import entity_trend

    return entity_trend(annotated_documents_cached(sf_dir))


def q_entity_communities(sf_dir: str):
    """Community detection over the entity co-occurrence graph:
    deterministic synchronous label propagation, 3 rounds
    (stages/graph_cc.label_propagation)."""
    from ..stages.canonicalize import canonical_entities
    from ..stages.graph_cc import _project_t, cooccurrence_pairs, label_propagation

    ann = annotated_documents_cached(sf_dir)
    edges = cooccurrence_pairs(ann, annotated=True)
    nodes = _project_t(
        canonical_entities(_explode_ann(ann)),
        {"node": "entity_id"},
        {"node": pa.string()},
    )
    lp = label_propagation(
        edges,
        nodes=nodes,
        src_col="entity_a",
        dst_col="entity_b",
        node_type=pa.string(),
    )
    return _project_t(
        lp,
        {"entity_id": "node", "community": "community"},
        {"entity_id": pa.string(), "community": pa.string()},
    )


def q_entity_fastrp(sf_dir: str):
    """Exact-integer FastRP node embeddings over the entity co-occurrence
    graph: hash-derived ±1/0 projections, 1- and 2-hop propagation
    moments (stages/graph_cc.fastrp_embeddings)."""
    from ..stages.graph_cc import _project_t, cooccurrence_pairs, fastrp_embeddings

    ann = annotated_documents_cached(sf_dir)
    edges = cooccurrence_pairs(ann, annotated=True)  # materialized inside fastrp
    emb = fastrp_embeddings(
        edges, src_col="entity_a", dst_col="entity_b", node_type=pa.string()
    )
    cols = [f"h1_{k}" for k in range(4)] + [f"h2_{k}" for k in range(4)]
    return _project_t(
        emb,
        {"entity_id": "node", **{c: c for c in cols}},
        {"entity_id": pa.string()},
    )


def q_entity_context_features(sf_dir: str):
    """Distributional entity features: hashed bag-of-context-words per
    canonical entity over KWIC windows
    (stages/relations.entity_context_features)."""
    from ..stages.relations import entity_context_features

    return entity_context_features(annotated_documents_cached(sf_dir))


def q_entity_timeline(sf_dir: str):
    """Temporal-KG provenance: per canonical entity, first/last crawl
    snapshot observed, number of distinct snapshots, and mention support
    (stages/canonicalize.entity_timeline; snapshot = doc_id % 8, the
    deterministic stand-in for warc_ts month buckets)."""
    from ..stages.canonicalize import entity_timeline

    return entity_timeline(annotated_documents_cached(sf_dir))


def q_fact_corroboration(sf_dir: str):
    """Knowledge-fusion fact support: per canonical fact, distinct-source
    count, mention support, and a corroborated flag (>= 2 independent
    sources — Knowledge-Vault-style multi-source trust; the ``source``
    column is the provenance proxy for a page's host). Carries ``source``
    through the fused detect so no doc->source join is ever shuffled."""
    from ..stages.canonicalize import fact_corroboration

    ds = _docs(sf_dir, columns=["doc_id", "text", "source"])
    ann = detect_mentions(ds, documents_gazetteer(), batch_size=2048)
    return fact_corroboration(ann)


def q_source_reliability(sf_dir: str):
    """Knowledge-fusion source scoring: per source, distinct facts
    asserted and how many are independently corroborated (>= 2 distinct
    sources overall) — the prior a fusion system assigns to the source's
    uncorroborated claims. Exact integers; division is the consumer's."""
    from ..stages.canonicalize import source_reliability

    ds = _docs(sf_dir, columns=["doc_id", "text", "source"])
    ann = detect_mentions(ds, documents_gazetteer(), batch_size=2048)
    return source_reliability(ann)


def _dict_utf8_length(col) -> "pa.Array":
    """Char length of a (possibly dictionary-encoded) string column —
    computed once per dictionary VALUE, then fanned out by take (doc_text
    is dictionary-encoded per mention to avoid copies)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        lens = pc.utf8_length(col.dictionary).cast(pa.int64())
        return lens.take(col.indices)
    return pc.utf8_length(col).cast(pa.int64())


def q_entity_salience(sf_dir: str):
    """Entity salience features per (document, entity): mention count,
    first-mention offset, and document length — the integer sufficient
    statistics for salience ranking (earlier + more frequent = more
    salient; Dunietz & Gillick-style features). The fused doc-local
    explode keeps every (doc, entity) group complete inside one batch, so
    the per-batch groupby IS the final answer: zero shuffles."""
    import pyarrow.compute as pc

    from ..stages.canonicalize import entity_id, explode_mentions

    def per_batch(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "entity_id": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.string()),
                "n_mentions": pa.array([], type=pa.int64()),
                "first_start": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        m = explode_mentions(b, keep_text=True)
        if m.num_rows == 0:
            return empty
        sn = m.column("surface_norm")
        lb = m.column("label")
        key = pc.binary_join_element_wise(
            sn.cast(pa.large_string()),
            lb.cast(pa.large_string()),
            pa.scalar("\x00", type=pa.large_string()),
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = pc.dictionary_encode(key)
        vocab = [entity_id(*k.rsplit("\x00", 1)) for k in enc.dictionary.to_pylist()]
        eids = pa.array(vocab, type=pa.string()).take(enc.indices)
        t = pa.table(
            {
                "doc_id": m.column("doc_id"),
                "entity_id": eids,
                "label": lb,
                "start": m.column("start").cast(pa.int64()),
                "nc": _dict_utf8_length(m.column("doc_text")),
            }
        )
        g = t.group_by(["doc_id", "entity_id", "label"]).aggregate(
            [([], "count_all"), ("start", "min"), ("nc", "min")]
        )
        return g.rename_columns(
            ["doc_id", "entity_id", "label", "n_mentions", "first_start", "n_chars"]
        )

    return annotated_documents_cached(sf_dir).map_batches(per_batch, batch_format="pyarrow")


def q_entity_cooccurrence(sf_dir: str):
    """KG co-occurrence edges: entity pairs co-mentioned in a document,
    weighted by document count. Pair generation is per-batch (documents
    never split across mention batches); only the pair-count aggregate
    shuffles."""
    from ..stages.graph_cc import cooccurrence_pairs

    return cooccurrence_pairs(annotated_documents_cached(sf_dir), annotated=True)


def q_entity_jaccard(sf_dir: str):
    """Link prediction over the KG: exact-rational neighborhood Jaccard
    (common / union neighbor counts as integers) for entity pairs sharing
    >= 2 co-occurrence neighbors."""
    import pyarrow as pa

    from ..stages.graph_cc import cooccurrence_pairs, neighborhood_jaccard

    edges = cooccurrence_pairs(annotated_documents_cached(sf_dir), annotated=True)
    return neighborhood_jaccard(
        edges,
        src_col="entity_a",
        dst_col="entity_b",
        node_type=pa.string(),
    )


def q_entity_resource_alloc(sf_dir: str):
    """Link prediction over the KG by the Resource-Allocation index:
    score(x, y) = Σ_z 1/deg(z) over common co-occurrence neighbors z, in
    1e-9 fixed point via integer floor division — bit-exact, no float
    (stages/graph_cc.resource_allocation)."""
    import pyarrow as pa

    from ..stages.graph_cc import cooccurrence_pairs, resource_allocation

    edges = cooccurrence_pairs(annotated_documents_cached(sf_dir), annotated=True)
    return resource_allocation(
        edges,
        src_col="entity_a",
        dst_col="entity_b",
        node_type=pa.string(),
    )


def q_entity_bfs(sf_dir: str, k: int = 4):
    """KG reachability: minimum hop distance (<= k) from the globally
    smallest entity over the co-occurrence graph — k rounds of frontier
    expansion (semi-join to adjacency + anti-join against visited), the
    semi-naive iterative-join form of BFS. Only the (node, dist) visited
    set and the (node,) frontier materialize per round."""
    from ..stages.graph_cc import bfs_distances, cooccurrence_pairs

    edges = cooccurrence_pairs(annotated_documents_cached(sf_dir), annotated=True)
    bf = bfs_distances(
        edges,
        k=k,
        src_col="entity_a",
        dst_col="entity_b",
        node_type=pa.string(),
    )
    from ..stages.graph_cc import _project_t

    return _project_t(
        bf,
        {"entity_id": "node", "dist": "dist"},
        {"entity_id": pa.string()},
    )


def q_entity_pagerank(sf_dir: str):
    """KG graph analytics: integer fixed-point PageRank over the entity
    co-occurrence graph (damping 0.85, 3 power iterations, scores in
    10^-12 units so every iteration is bit-deterministic and hash-
    comparable against the unrolled SQL oracle).

    The node universe is the canonical entity set — singletons (mentioned
    but never co-mentioned) appear at the 0.15 damping base. The mention
    stream is materialized ONCE (object-store backed, spillable) because
    it has two consumers (edge generation + node universe); everything
    downstream is the bounded (node, score) frontier."""
    from ..stages.canonicalize import canonical_entities
    from ..stages.graph_cc import _project_t, cooccurrence_pairs, pagerank

    ann = annotated_documents_cached(sf_dir)
    edges = cooccurrence_pairs(ann, annotated=True)
    nodes = canonical_entities(_explode_ann(ann))
    pr = pagerank(
        edges,
        nodes=nodes,
        src_col="entity_a",
        dst_col="entity_b",
        node_col="entity_id",
        node_type=pa.string(),
    )
    return _project_t(
        pr,
        {"entity_id": "node", "pr_score": "pr_score"},
        {"entity_id": pa.string()},
    )


def _ppr_seeds() -> list[str]:
    """Seed entity ids for the personalized-PageRank contract query —
    a 2-entity query set (one SYSTEM, one OPERATOR), query-bounded like a
    SPARQL VALUES block."""
    from ..stages.canonicalize import entity_id

    return [entity_id("spark", "SYSTEM"), entity_id("scan", "OPERATOR")]


def q_entity_ppr(sf_dir: str):
    """Personalized PageRank (random walk with restart) from a 2-seed
    query set over the entity co-occurrence graph — "how related is every
    canonical entity to THESE entities", the serving primitive behind
    related-entity panels. Same integer fixed-point rules as
    `entity_pagerank` (bit-deterministic, hash-comparable against the
    unrolled SQL oracle ner_oracle.sql_entity_ppr); the 0.15 restart mass
    lands only on the seeds, so entities outside the seeds' 3-hop
    neighborhood score exactly 0. Seeds ship inside task closures
    (query-bounded, never shuffled); the shuffle profile is identical to
    `entity_pagerank`."""
    from ..stages.canonicalize import canonical_entities
    from ..stages.graph_cc import (
        _project_t,
        cooccurrence_pairs,
        personalized_pagerank,
    )

    ann = annotated_documents_cached(sf_dir)
    edges = cooccurrence_pairs(ann, annotated=True)
    nodes = canonical_entities(_explode_ann(ann))
    pr = personalized_pagerank(
        edges,
        nodes=nodes,
        seeds=_ppr_seeds(),
        src_col="entity_a",
        dst_col="entity_b",
        node_col="entity_id",
        node_type=pa.string(),
    )
    return _project_t(
        pr,
        {"entity_id": "node", "ppr_score": "ppr_score"},
        {"entity_id": pa.string()},
    )


def sql_entity_ppr_oracle() -> str:
    from .ner_oracle import sql_entity_ppr

    return sql_entity_ppr(DEFAULT_GAZETTEER, _ppr_seeds())


def q_relation_candidates(sf_dir: str):
    """KG relation-candidate generation: directed proximity pairs of
    accepted mentions (different entities, char gap within a window).
    Zero shuffles — pair generation is batch-local by doc contiguity."""
    from ..stages.relations import relation_candidates

    return relation_candidates(annotated_documents_cached(sf_dir), annotated=True)


def q_entity_pmi(sf_dir: str):
    """Exact-rational PMI association scores for co-occurring entity pairs:
    pmi = log(pmi_num / pmi_den) with pmi_num = n_pair * N and
    pmi_den = df_a * df_b emitted as INTEGERS — the log is left to the
    consumer so the oracle hash-matches bit-exactly (float log drifts ulps
    between engines).

    Shape: co-occurrence pairs (one shuffle) + per-entity doc frequency
    (batch-local distinct + one groupby-sum); the df table is
    gazetteer-bounded, so it broadcasts via ray.put and the pair lookup is
    vectorized index_in/take — no join shuffle."""
    import ray

    from ..stages.graph_cc import cooccurrence_pairs, entity_doc_freq

    ann = annotated_documents_cached(sf_dir)
    pairs = cooccurrence_pairs(ann, annotated=True)
    df_rows = entity_doc_freq(ann, annotated=True).take_all()  # gazetteer-bounded
    n_total = _docs(sf_dir, columns=["doc_id"]).count()
    eids = pa.array([r["eid"] for r in df_rows], type=pa.string())
    dfs = pa.array([r["df"] for r in df_rows], type=pa.int64())
    ref = ray.put((eids, dfs))

    def attach(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "entity_a": pa.array([], type=pa.string()),
                    "entity_b": pa.array([], type=pa.string()),
                    "n_pair": pa.array([], type=pa.int64()),
                    "pmi_num": pa.array([], type=pa.int64()),
                    "pmi_den": pa.array([], type=pa.int64()),
                }
            )
        e_arr, d_arr = ray.get(ref)
        da = pc.take(d_arr, pc.index_in(b.column("entity_a"), value_set=e_arr))
        db = pc.take(d_arr, pc.index_in(b.column("entity_b"), value_set=e_arr))
        n_pair = b.column("n_docs")
        return pa.table(
            {
                "entity_a": b.column("entity_a"),
                "entity_b": b.column("entity_b"),
                "n_pair": n_pair,
                "pmi_num": pc.multiply(n_pair, pa.scalar(n_total, type=pa.int64())),
                "pmi_den": pc.multiply(da, db),
            }
        )

    return pairs.map_batches(attach, batch_format="pyarrow")


def q_mention_contexts(sf_dir: str):
    """KWIC context snippets per accepted mention (vectorized buffer
    gather over the dictionary-encoded per-doc text)."""
    from ..stages.relations import mention_contexts

    return mention_contexts(mentions_dataset(sf_dir, keep_text=True))


BENCH_MAX_DOC_ID = 20  # docs below this id form the synthetic "benchmark" set


def q_contamination(sf_dir: str):
    """Benchmark decontamination: docs sharing >= 1 word-3-gram shingle
    with the benchmark set (deterministically: doc_id < 20 of the same
    corpus — no external data). The tiny benchmark shingle set broadcasts
    sorted; membership is one searchsorted per batch, zero shuffles."""
    import pyarrow.parquet as pq

    from ..stages.dedup_approx import benchmark_shingles, contamination_counts

    bench_tab = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "<", BENCH_MAX_DOC_ID)],
    )
    hashes = benchmark_shingles(bench_tab.column("text").to_pylist())
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    return contamination_counts(ds, hashes)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_user_event_pivot(sf_dir: str):
    """PIVOT: one row per user with one count column per event type
    (conditional aggregation — the per-batch partial emits the fixed
    pivoted layout, so the shuffle moves at most one row per user per
    batch and the groupby is a plain column-wise sum)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        cols = {"user_id": b.column("user_id")}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pc.equal(et, pa.scalar(t)).cast(pa.int64())
        out = pa.table(cols)
        return out.group_by(["user_id"]).aggregate(
            [(f"n_{t}", "sum") for t in EVENT_TYPES]
        ).rename_columns(["user_id"] + [f"n_{t}" for t in EVENT_TYPES])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES])
    )


def sql_user_event_pivot() -> str:
    cols = ",\n  ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"SELECT user_id,\n  {cols}\nFROM events GROUP BY user_id"


ROLLUP_ALL = "_ALL_"  # subtotal marker (not NULL: keeps both engines string-typed)


def q_source_lang_rollup(sf_dir: str):
    """OLAP ROLLUP over (source, lang): per-group doc counts plus source
    subtotals and the grand total, subtotal keys marked '_ALL_'.  ONE
    shuffle: the three rollup levels re-aggregate the (tiny) finest-level
    aggregate with map_batches relabels — no second pass over the data."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "lang"]
    )

    def partial(b: pa.Table) -> pa.Table:
        out = b.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return out.rename_columns(["source", "lang", "n"])

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .materialize()  # tiny: |source| x |lang| rows; reused 3x below
    )

    def relabel(keep_source: bool):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "source": pa.array([], type=pa.string()),
                        "lang": pa.array([], type=pa.string()),
                        "n_docs": pa.array([], type=pa.int64()),
                    }
                )
            all_col = pa.array([ROLLUP_ALL] * b.num_rows, type=pa.string())
            return pa.table(
                {
                    "source": b.column("source") if keep_source else all_col,
                    "lang": all_col,
                    "n_docs": b.column("n_docs"),
                }
            )

        return f

    from ray.data.aggregate import Sum as _Sum

    sub_source = (
        fine.map_batches(relabel(True), batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(_Sum("n_docs", alias_name="n_docs"))
    )
    grand = (
        fine.map_batches(relabel(False), batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(_Sum("n_docs", alias_name="n_docs"))
    )
    return fine.union(sub_source).union(grand)


def sql_source_lang_rollup() -> str:
    return (
        f"SELECT COALESCE(source, '{ROLLUP_ALL}') AS source,\n"
        f"  COALESCE(lang, '{ROLLUP_ALL}') AS lang,\n"
        f"  CAST(count(*) AS BIGINT) AS n_docs\n"
        f"FROM documents GROUP BY ROLLUP (source, lang)"
    )


def q_order_status_cube(sf_dir: str):
    """OLAP CUBE over (o_orderstatus, o_orderpriority): all four grouping
    sets (fine, each single-key marginal, grand total) re-aggregated from
    the tiny finest-level aggregate — one data pass, same '_ALL_' marker
    convention as the ROLLUP query."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderstatus", "o_orderpriority"],
    )

    def partial(b: pa.Table) -> pa.Table:
        out = b.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["o_orderstatus", "o_orderpriority", "n"])

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("n", alias_name="n_orders"))
        .materialize()  # |status| x |priority| rows; reused 3x
    )

    def relabel(keep_status: bool, keep_priority: bool):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "o_orderstatus": pa.array([], type=pa.string()),
                        "o_orderpriority": pa.array([], type=pa.string()),
                        "n_orders": pa.array([], type=pa.int64()),
                    }
                )
            all_col = pa.array([ROLLUP_ALL] * b.num_rows, type=pa.string())
            return pa.table(
                {
                    "o_orderstatus": b.column("o_orderstatus")
                    if keep_status
                    else all_col,
                    "o_orderpriority": b.column("o_orderpriority")
                    if keep_priority
                    else all_col,
                    "n_orders": b.column("n_orders"),
                }
            )

        return f

    def marginal(keep_status: bool, keep_priority: bool):
        from ray.data.aggregate import Sum as _Sum

        return (
            fine.map_batches(
                relabel(keep_status, keep_priority), batch_format="pyarrow"
            )
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(_Sum("n_orders", alias_name="n_orders"))
        )

    return (
        fine.union(marginal(True, False))
        .union(marginal(False, True))
        .union(marginal(False, False))
    )


def sql_order_status_cube() -> str:
    return (
        f"SELECT COALESCE(o_orderstatus, '{ROLLUP_ALL}') AS o_orderstatus,\n"
        f"  COALESCE(o_orderpriority, '{ROLLUP_ALL}') AS o_orderpriority,\n"
        f"  CAST(count(*) AS BIGINT) AS n_orders\n"
        f"FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    )


SEARCH_PATTERN = "spark"


def q_pattern_offsets(sf_dir: str):
    """Grep-like full scan: every occurrence offset of a literal pattern
    across the corpus (1-based char offsets, substr convention). Zero
    shuffle; offsets reconstruct vectorized from the cumulative lengths of
    the split pieces — no per-char Python.

    Constraint: the pattern must be borderless (no proper prefix that is
    also a suffix — true for 'spark') so split-piece enumeration equals the
    oracle's overlap-inclusive substr scan; a self-overlapping pattern like
    'aa' would need a different kernel."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    pat = SEARCH_PATTERN
    plen = len(pat)

    def scan(b: pa.Table) -> pa.Table:
        texts = b.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        pieces = pc.split_pattern(texts, pat)
        counts = pc.list_value_length(pieces).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(pieces)
        piece_chars = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(counts)
        parents = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        first = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=first[1:])
        # within-doc running position: piece length + pattern length each hop
        step = piece_chars + plen
        run = np.cumsum(step)
        # per-doc cumsum: subtract the running total before each doc start
        before = np.concatenate(([0], run))[first[:-1]]
        offsets = run - np.repeat(before, counts)
        # last piece of each doc has NO following match -> drop it
        is_last = np.zeros(len(parents), dtype=bool)
        is_last[first[1:] - 1] = True
        keep = ~is_last
        ids = b.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_pydict(
            {
                "doc_id": ids.take(pa.array(parents[keep])),
                # 1-based start of the match that FOLLOWS piece i:
                # pieces consumed + the pattern hops before it
                "pos": pa.array(offsets[keep] - plen + 1),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def sql_pattern_offsets() -> str:
    pat = SEARCH_PATTERN.replace("'", "''")
    return (
        f"SELECT doc_id, CAST(s AS BIGINT) AS pos\n"
        f"FROM documents, LATERAL (\n"
        f"  SELECT unnest(range(1, length(text) - {len(SEARCH_PATTERN)} + 2))"
        f" AS s)\n"
        f"WHERE substr(text, s, {len(SEARCH_PATTERN)}) = '{pat}'"
    )


DECILE_QS = [i / 10 for i in range(1, 10)]


def q_doc_length_deciles(sf_dir: str):
    """Equi-depth histogram: decile boundaries of doc length via the
    distributed quickselect (no global sort), then one zero-shuffle
    bucket-count pass (searchsorted against the broadcast boundary list,
    per-batch bincount partials, a 10-key groupby-sum)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.rank import exact_quantiles

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"]
    )
    bounds = np.array(
        [v for _, v in exact_quantiles(ds, "n_chars", DECILE_QS)], dtype=np.float64
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        v = b.column("n_chars").to_numpy(zero_copy_only=False)
        # bucket = number of boundaries <= value (0..len(bounds))
        bk = np.searchsorted(bounds, v, side="right")
        counts = np.bincount(bk, minlength=len(bounds) + 1)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bucket": pa.array(nz, type=pa.int64()),
                "n": pa.array(counts[nz], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_docs"))
    )


def sql_doc_length_deciles() -> str:
    qs = ", ".join(str(q) for q in DECILE_QS)
    return (
        f"WITH b AS (SELECT quantile_disc(n_chars, [{qs}]) AS qs FROM documents)\n"
        f"SELECT CAST(len(list_filter(b.qs, q -> d.n_chars >= q)) AS BIGINT)"
        f" AS bucket,\n"
        f"  CAST(count(*) AS BIGINT) AS n_docs\n"
        f"FROM documents d CROSS JOIN b GROUP BY 1"
    )


def q_events_resampled(sf_dir: str):
    """Time-series densification: per-user hourly event counts with gap
    hours filled as zeros between each user's first and last event."""
    import ray.data as rd

    from ..stages.events import resample_user_windows

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    return resample_user_windows(ds)


def q_entity_kcore(sf_dir: str):
    """k-core of the entity co-occurrence graph (k=2): entities in the
    densely-connected core with their within-core degree — peel rounds
    early-stop on the fixpoint; the oracle unrolls the same round count."""
    from ..stages.graph_cc import _project_t, cooccurrence_pairs, kcore

    out = kcore(
        cooccurrence_pairs(annotated_documents_cached(sf_dir), annotated=True),
        k=2,
        src_col="entity_a",
        dst_col="entity_b",
        node_type=pa.string(),
    )
    return _project_t(
        out,
        {"entity_id": "node", "core_deg": "core_deg"},
        {"entity_id": pa.string()},
    )


def q_entity_sameas(sf_dir: str):
    """owl:sameAs-style transitive closure over MULTI-KEY alias blocking:
    canonical surfaces sharing EITHER the punctuation-stripped key OR the
    first token link into one identity cluster, closed transitively via
    connected components (chains like "u.s." ~ "u s" ~ "u s navy" merge
    even when no single key spans all three). Node ids are the shared
    signed md5 h64 of the surface, so the component label (min reachable
    id) is value-exact against the recursive-CTE oracle."""
    from ray.data.aggregate import Count, Min

    from ..stages.canonicalize import canonical_entities
    from ..stages.dedup_approx import h64
    from ..stages.graph_cc import _project, connected_components

    ents = canonical_entities(mentions_dataset(sf_dir))
    surf = ents.select_columns(["surface_norm"]).groupby("surface_norm").aggregate(
        Count(alias_name="_c")
    )
    return sameas_components(surf)


def sameas_components(surf):
    """(surface_norm, ...) Dataset of DISTINCT surfaces -> (surface_norm,
    sameas_component): the multi-key blocking closure of q_entity_sameas
    (factored out so tests can drive synthetic chains directly)."""
    import numpy as np

    from ..stages.dedup_approx import h64
    from ..stages.graph_cc import _project, connected_components

    def keyed(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "surface_norm": pa.array([], type=pa.string()),
                    "sid": pa.array([], type=pa.int64()),
                    "k1": pa.array([], type=pa.string()),
                    "k2": pa.array([], type=pa.string()),
                }
            )
        s = b.column("surface_norm")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        sid = np.fromiter(
            (h64(v) for v in s.to_pylist()), dtype=np.uint64, count=len(s)
        ).astype(np.int64)
        k1 = pc.replace_substring_regex(s, "[^a-z0-9]", "")
        k2 = pc.struct_field(pc.extract_regex(s, r"^(?P<t>[^ ]+)"), "t")
        return pa.table(
            {"surface_norm": s, "sid": pa.array(sid, type=pa.int64()), "k1": k1, "k2": k2}
        )

    nodes = surf.map_batches(keyed, batch_format="pyarrow").materialize()

    def link_group(g: pa.Table) -> pa.Table:
        sid = g.column("sid").to_numpy(zero_copy_only=False)
        m = int(sid.min())
        return pa.table(
            {
                "src": pa.array(sid, type=pa.int64()),
                "dst": pa.array(np.full(len(sid), m), type=pa.int64()),
            }
        )

    e1 = nodes.groupby("k1").map_groups(link_group, batch_format="pyarrow")
    e2 = nodes.groupby("k2").map_groups(link_group, batch_format="pyarrow")
    cc = connected_components(
        e1.union(e2),
        nodes=_project(nodes, {"node": "sid"}),
    )
    cc = _project(cc, {"jnode": "node", "component": "component"}).repartition(8)
    joined = nodes.join(
        cc, "inner", num_partitions=8, on=("sid",), right_on=("jnode",)
    )

    def out(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "surface_norm": pa.array([], type=pa.string()),
                    "sameas_component": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "surface_norm": b.column("surface_norm"),
                "sameas_component": b.column("component"),
            }
        )

    return joined.map_batches(out, batch_format="pyarrow")


SIGNED_WRAP = (
    "CAST(md5_number_upper(surface_norm) - CASE WHEN "
    "md5_number_upper(surface_norm) >= 9223372036854775808 THEN "
    "18446744073709551616 ELSE 0 END AS BIGINT)"
)


def sql_entity_sameas() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH RECURSIVE {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"ce AS (SELECT pname AS surface_norm FROM acc GROUP BY pname),\n"
        f"n AS (SELECT surface_norm, {SIGNED_WRAP} AS sid,\n"
        f"  regexp_replace(surface_norm, '[^a-z0-9]', '', 'g') AS k1,\n"
        f"  regexp_extract(surface_norm, '^[^ ]+') AS k2 FROM ce),\n"
        f"e1 AS (SELECT n.sid AS src, m.msid AS dst FROM n JOIN\n"
        f"  (SELECT k1, min(sid) AS msid FROM n GROUP BY k1) m ON m.k1 = n.k1),\n"
        f"e2 AS (SELECT n.sid AS src, m.msid AS dst FROM n JOIN\n"
        f"  (SELECT k2, min(sid) AS msid FROM n GROUP BY k2) m ON m.k2 = n.k2),\n"
        f"edges0 AS (SELECT src, dst FROM e1 UNION SELECT src, dst FROM e2),\n"
        f"edges AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),\n"
        f"reach(node, lab) AS (\n"
        f"  SELECT sid, sid FROM n\n"
        f"  UNION\n"
        f"  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node)\n"
        f"SELECT n.surface_norm, CAST(min(r.lab) AS BIGINT) AS sameas_component\n"
        f"FROM n JOIN reach r ON r.node = n.sid GROUP BY n.surface_norm"
    )


def q_entity_aliases(sf_dir: str):
    """Entity resolution by alias normalization: canonical surface forms
    that collapse to the same punctuation/space-stripped key (e.g.
    "u.s." / "u s" / "us") grouped per label — (alias_key, label,
    n_surfaces, n_mentions). One vectorized regexp per batch over the
    (gazetteer-bounded) canonical entity table, then a tiny groupby."""
    from ray.data.aggregate import Count, Sum

    from ..stages.canonicalize import canonical_entities

    ents = canonical_entities(mentions_dataset(sf_dir))

    def add_key(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "alias_key": pa.array([], type=pa.string()),
                    "label": pa.array([], type=pa.string()),
                    "n_mentions": pa.array([], type=pa.int64()),
                }
            )
        sn = b.column("surface_norm")
        if isinstance(sn, pa.ChunkedArray):
            sn = sn.combine_chunks()
        key = pc.replace_substring_regex(sn, "[^a-z0-9]", "")
        return pa.table(
            {
                "alias_key": key,
                "label": b.column("label"),
                "n_mentions": b.column("n_mentions"),
            }
        )

    return (
        ents.map_batches(add_key, batch_format="pyarrow")
        .groupby(["alias_key", "label"])
        .aggregate(
            Count(alias_name="n_surfaces"),
            Sum("n_mentions", alias_name="n_mentions"),
        )
    )


def q_cms_token_registers(sf_dir: str):
    """Count-Min sketch of corpus word frequencies: the merged register
    table (d x w bounded — the query output IS the sketch, so the SQL
    oracle is exact; point-estimate guarantees pinned in tests)."""
    from ..stages.sketch import cms_registers

    return cms_registers(_docs(sf_dir, columns=["text"]))


def q_entity_triangles(sf_dir: str):
    """Per-entity triangle participation + degree over the co-occurrence
    graph (wedge-generate at the lowest-id apex, close with one hash join
    against the edge list; degree/triangle/universe rows merged by a
    single tag-union groupby-sum)."""
    from ..stages.canonicalize import canonical_entities
    from ..stages.graph_cc import _project_t, cooccurrence_pairs, triangle_counts

    ann = annotated_documents_cached(sf_dir)
    out = triangle_counts(
        cooccurrence_pairs(ann, annotated=True),
        nodes=canonical_entities(_explode_ann(ann)),
        src_col="entity_a",
        dst_col="entity_b",
        node_col="entity_id",
        node_type=pa.string(),
    )
    return _project_t(
        out,
        {"entity_id": "node", "degree": "degree", "n_triangles": "n_triangles"},
        {"entity_id": pa.string()},
    )


def q_running_extrema(sf_dir: str):
    """Cumulative window frame (ROWS UNBOUNDED PRECEDING): running max/min
    of event value per user in event-time order. Extrema only — exact
    double comparisons, no accumulation arithmetic to drift vs the
    oracle."""
    import ray.data as rd

    from ..stages.events import running_extrema

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )
    return running_extrema(ds)


def q_doc_sentences(sf_dir: str):
    """Sentence-split explode: one row per sentence per document
    (terminator+whitespace split, identical RE2 pattern on both engines)."""
    from ..stages.chunking import split_sentences

    return split_sentences(_docs(sf_dir, columns=["doc_id", "text"]))


BIG_SPENDER_PRICE = 350_000.0


def q_big_spenders(sf_dir: str):
    """Distributed semi-join: customers with at least one order above a
    price threshold. The kept-key side (distinct big-order custkeys) is
    dedup-bounded, so the broadcast shape holds far longer than a raw
    orders broadcast would; above the cap semi_join switches to a
    hash-partitioned left_semi automatically."""
    import ray.data as rd

    from ..stages.antijoin import semi_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    big = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    ).filter(
        expr=f"o_totalprice > {BIG_SPENDER_PRICE}"
    )
    return semi_join(cust, "c_custkey", big, "o_custkey")


def sql_big_spenders() -> str:
    return (
        f"SELECT c_custkey, c_name, c_nationkey FROM customer c\n"
        f"WHERE EXISTS (SELECT 1 FROM orders o\n"
        f"  WHERE o.o_custkey = c.c_custkey\n"
        f"    AND o.o_totalprice > {BIG_SPENDER_PRICE})"
    )


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"


def q_shipping_priority(sf_dir: str):
    """TPC-H-Q3-shaped multi-way join: segment-filtered customers semi-join
    orders (date < cutoff), hash-partitioned join against shipdate-filtered
    lineitem, exact integer revenue aggregate, top-10. Join plan for the
    10^12-row shape: the only all-to-all is orders ⋈ lineitem on the
    orderkey (both fact-sized, Ray native hash join); the customer
    restriction reaches orders as a semi-join whose key side is the
    dedup-bounded filtered custkey set (broadcast below cap, partitioned
    left_semi above). Revenue is computed per row as
    cents * (100 - discount_cents) — pure int64, so sums are bit-exact with
    no float-order drift at any parallelism."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.antijoin import semi_join

    cutoff_us = int(
        pa.scalar(Q3_CUTOFF).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).filter(expr=f"c_mktsegment == '{Q3_SEGMENT}'")

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def orders_pre(b: pa.Table) -> pa.Table:
        us = b.column("o_orderdate").combine_chunks().cast(pa.int64())
        b = b.set_column(
            b.column_names.index("o_orderdate"), "o_orderdate_us", us
        )
        return b.filter(pc.less(us, pa.scalar(cutoff_us, type=pa.int64())))

    orders = orders.map_batches(orders_pre, batch_format="pyarrow")
    orders = semi_join(orders, "o_custkey", cust, "c_custkey").drop_columns(
        ["o_custkey"]
    )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_pre(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").combine_chunks().cast(pa.int64())
        b = b.filter(pc.greater(ship, pa.scalar(cutoff_us, type=pa.int64())))
        cents = pc.round(pc.multiply(b.column("l_extendedprice"), pa.scalar(100.0))).cast(pa.int64())
        disc = pc.round(pc.multiply(b.column("l_discount"), pa.scalar(100.0))).cast(pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, type=pa.int64()), disc))
        return pa.Table.from_pydict(
            {"l_orderkey": b.column("l_orderkey"), "revenue_e4": rev}
        )

    li = li.map_batches(li_pre, batch_format="pyarrow")
    joined = li.join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    agg = joined.groupby(
        ["l_orderkey", "o_orderdate_us", "o_orderpriority"]
    ).aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    return agg.sort(
        ["revenue_e4", "o_orderdate_us", "l_orderkey"],
        descending=[True, False, False],
    ).limit(10)


def sql_shipping_priority() -> str:
    return (
        f"SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,\n"
        f"  o_orderpriority,\n"
        f"  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)\n"
        f"      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)\n"
        f"    AS revenue_e4\n"
        f"FROM customer, orders, lineitem\n"
        f"WHERE c_mktsegment = '{Q3_SEGMENT}' AND c_custkey = o_custkey\n"
        f"  AND l_orderkey = o_orderkey\n"
        f"  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'\n"
        f"  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'\n"
        f"GROUP BY l_orderkey, o_orderdate_us, o_orderpriority\n"
        f"ORDER BY revenue_e4 DESC, o_orderdate_us, l_orderkey\n"
        f"LIMIT 10"
    )


def q_trailing_max(sf_dir: str):
    """Bounded window frame (ROWS 3 PRECEDING .. CURRENT ROW): trailing-4
    max of event value per user in event-time order."""
    import ray.data as rd

    from ..stages.events import trailing_max

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )
    return trailing_max(ds)


def q_session_funnel(sf_dir: str):
    """Per-session click->purchase conversion funnel over gap sessions."""
    import ray.data as rd

    from ..stages.events import session_funnel

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return session_funnel(ds)


def q_recent_count(sf_dir: str):
    """Value-based window frame (RANGE 10min PRECEDING): per-event count of
    the user's events in the trailing time window."""
    import ray.data as rd

    from ..stages.events import recent_count

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )
    return recent_count(ds)


def q_event_type_transitions(sf_dir: str):
    """Markov transition counts of consecutive event types per user."""
    import ray.data as rd

    from ..stages.events import event_type_transitions

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return event_type_transitions(ds)


def q_daily_active_users(sf_dir: str):
    """DAU: exact COUNT(DISTINCT user) per day, two-level aggregate."""
    import ray.data as rd

    from ..stages.events import daily_active_users

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    return daily_active_users(ds)


def q_weekly_active_users(sf_dir: str):
    """Sliding 7-day active users (distinct pairs exploded to their
    covering windows, dedup again, per-window count)."""
    import ray.data as rd

    from ..stages.events import weekly_active_users

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    return weekly_active_users(ds)


def q_customers_no_big_orders(sf_dir: str):
    """Set-op EXCEPT: custkeys with no order above the big-spender
    threshold (distributed anti-join — the complement of the semi-join in
    ``big_spenders``)."""
    import ray.data as rd

    from ..stages.antijoin import anti_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    big = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    ).filter(expr=f"o_totalprice > {BIG_SPENDER_PRICE}")
    return anti_join(cust, "c_custkey", big, "o_custkey")


def sql_customers_no_big_orders() -> str:
    return (
        f"SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders\n"
        f"WHERE o_totalprice > {BIG_SPENDER_PRICE}"
    )


def q_first_seen_daily(sf_dir: str):
    """New users per UTC day (per-user min event time, then a day count)."""
    import ray.data as rd

    from ..stages.events import first_seen_daily

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    return first_seen_daily(ds)


def q_late_events(sf_dir: str, lateness_us: int = 600_000_000):
    """Watermark / late-data handling (the streaming-semantics gap of a
    batch engine, evaluated deterministically): arrival order is a seeded
    Knuth-multiplicative scramble of event_id, the watermark is the
    EXCLUSIVE running max of event time over earlier arrivals (distributed
    prefix scan: per-block maxima + driver prefix + per-block cummax), and
    an event is late when it arrives > lateness behind the watermark. The
    first arrival (undefined watermark) is excluded, mirroring SQL NULL
    window semantics."""
    import pyarrow.compute as pc

    from ..stages.rank import global_prefix_max

    ev = _events(sf_dir, columns=["event_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        eid = b.column("event_id")
        if isinstance(eid, pa.ChunkedArray):
            eid = eid.combine_chunks()
        ts_us = b.column("ts").cast(pa.int64())
        ak = pc.multiply_checked(eid, pa.scalar(2654435761, type=pa.int64()))
        ak = pc.bit_wise_and(ak, pa.scalar((1 << 32) - 1, type=pa.int64()))
        return pa.table({"event_id": eid, "ts_us": ts_us, "ak": ak})

    ds = ev.map_batches(prep, batch_format="pyarrow")
    ds = global_prefix_max(ds, ["ak", "event_id"], "ts_us", out_col="wm")

    def finish(b: pa.Table) -> pa.Table:
        wm = b.column("wm")
        if isinstance(wm, pa.ChunkedArray):
            wm = wm.combine_chunks()
        valid = pc.is_valid(wm)
        b = b.filter(valid)
        wm = b.column("wm")
        late = pc.cast(
            pc.less(
                b.column("ts_us"),
                pc.subtract(wm, pa.scalar(lateness_us, type=pa.int64())),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "watermark_us": wm,
                "is_late": late,
            }
        )

    return ds.map_batches(finish, batch_format="pyarrow")


def sql_late_events(lateness_us: int = 600_000_000) -> str:
    return (
        f"WITH a AS (SELECT event_id, epoch_us(ts) AS ts_us,\n"
        f"  (event_id * 2654435761) % 4294967296 AS ak FROM events),\n"
        f"w AS (SELECT event_id, ts_us, max(ts_us) OVER (ORDER BY ak, event_id\n"
        f"  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM a)\n"
        f"SELECT event_id, CAST(wm AS BIGINT) AS watermark_us,\n"
        f"  CAST(ts_us < wm - {lateness_us} AS BIGINT) AS is_late\n"
        f"FROM w WHERE wm IS NOT NULL"
    )


def q_event_gaps(sf_dir: str):
    """LAG window function: per-event inter-arrival gap within each user's
    event-time order (first event gap = -1)."""
    import ray.data as rd

    from ..stages.events import event_gaps

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )
    return event_gaps(ds)


def q_entity_postings(sf_dir: str):
    """A2 distributed posting-list index surfaced in the driver contract:
    surface_norm -> sorted doc-id postings (per-mention append semantics),
    built by the salted two-phase collector; the list column is emitted as
    a joined string so the value-hash oracle can compare it."""
    from ..stages.indexes import build_entity_index

    m = mentions_dataset(sf_dir).select_columns(["surface_norm", "doc_id"])
    idx = build_entity_index(m)

    def stringify(b: pa.Table) -> pa.Table:
        lists = b.column("doc_ids")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat_str = pc.cast(pc.list_flatten(lists), pa.string())
        offsets = lists.offsets
        as_str = pa.ListArray.from_arrays(offsets, flat_str)
        joined = pc.binary_join(as_str, ",")
        return pa.Table.from_pydict(
            {
                "surface_norm": b.column("surface_norm"),
                "doc_ids_str": joined,
                "n_postings": b.column("n_postings"),
            }
        )

    return idx.map_batches(stringify, batch_format="pyarrow")


def q_graph_degree(sf_dir: str):
    """Graph adjacency stats from the materialized triples: per (subj, pred)
    the distinct-object degree and total mention count.

    ZERO shuffles: subj IS the doc id, and explode -> triples -> degree run
    FUSED in one batch fn over annotated documents (one row per doc), so a
    document's triples are whole by construction — Ray's dynamic block
    splitting between doc rows cannot separate them (the same fusion
    guarantee as ``cooccurrence_pairs(annotated=True)``). Were the key NOT
    aligned with the doc layout, this would need the groupby(s,p,o) ->
    groupby(s,p) partial-aggregate chain instead."""
    ann = annotated_documents_cached(sf_dir)

    def degree(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "subj": pa.array([], type=pa.string()),
                    "pred": pa.array([], type=pa.string()),
                    "n_objects": pa.array([], type=pa.int64()),
                    "n_mentions": pa.array([], type=pa.int64()),
                }
            )
        cols = []
        for name in ("subj", "pred", "obj"):
            c = b.column(name)
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            cols.append(c.cast(pa.large_string()))
        sep = pa.scalar("\x00", type=pa.large_string())
        sp_enc = pc.dictionary_encode(pc.binary_join_element_wise(cols[0], cols[1], sep))
        sp = sp_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        spo_enc = pc.dictionary_encode(
            pc.binary_join_element_wise(cols[0], cols[1], cols[2], sep)
        )
        spo = spo_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_sp = len(sp_enc.dictionary)
        n_mentions = np.bincount(sp, minlength=n_sp)
        # distinct (s,p,o) -> its (s,p) group, counted once
        first_spo = np.unique(spo, return_index=True)[1]
        n_objects = np.bincount(sp[first_spo], minlength=n_sp)
        first_sp = np.full(n_sp, len(sp), dtype=np.int64)
        np.minimum.at(first_sp, sp, np.arange(len(sp)))
        out = b.select(["subj", "pred"]).take(pa.array(first_sp))
        out = out.append_column("n_objects", pa.array(n_objects, type=pa.int64()))
        return out.append_column("n_mentions", pa.array(n_mentions, type=pa.int64()))

    def fused(b: pa.Table) -> pa.Table:
        m = explode_mentions(b, subj_col="doc_id")
        t = add_triple_columns(m, subj_col="doc_id")
        return degree(t.select(["subj", "pred", "obj"]))

    return ann.map_batches(fused, batch_format="pyarrow")


def q_pred_cardinality(sf_dir: str):
    """KG schema audit: per predicate, does it behave FUNCTIONALLY in the
    emitted graph?  (pred, n_subjects, n_multi_subjects, max_objects,
    n_objects) — subjects observed, subjects holding >1 distinct object
    (each one a functional-predicate violation), and the max/total
    distinct-object degree.  The audit drives ontology decisions at KG
    build time (a pred with n_multi_subjects=0 can be stored as a column,
    not an edge list).

    Shape: the zero-shuffle per-(subj,pred) degree kernel
    (``q_graph_degree``) + a per-batch partial combiner collapsing to at
    most |label set| rows per batch, so the only all-to-all exchange is a
    groupby over the tiny predicate key — skew-free at any corpus size."""
    from ray.data.aggregate import Max, Sum

    deg = q_graph_degree(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "pred": pa.array([], type=pa.string()),
                    "ns": pa.array([], type=pa.int64()),
                    "nm": pa.array([], type=pa.int64()),
                    "mx": pa.array([], type=pa.int64()),
                    "no": pa.array([], type=pa.int64()),
                }
            )
        nobj = b.column("n_objects")
        if isinstance(nobj, pa.ChunkedArray):
            nobj = nobj.combine_chunks()
        t = pa.table(
            {
                "pred": b.column("pred"),
                "ns": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "nm": pc.cast(pc.greater(nobj, 1), pa.int64()),
                "mx": nobj,
                "no": nobj,
            }
        )
        g = t.group_by("pred").aggregate(
            [("ns", "sum"), ("nm", "sum"), ("mx", "max"), ("no", "sum")]
        )
        return g.rename_columns(["pred", "ns", "nm", "mx", "no"])

    out = (
        deg.map_batches(partial, batch_format="pyarrow")
        .groupby("pred")
        .aggregate(
            Sum("ns", alias_name="n_subjects"),
            Sum("nm", alias_name="n_multi_subjects"),
            Max("mx", alias_name="max_objects"),
            Sum("no", alias_name="n_objects"),
        )
    )
    return out


# --- host link graph (web-graph extraction from raw HTML) --------------------

LINKS_PER_PAGE = 3
LINK_HOST_BUCKETS = 32


def _linked_pages(sf_dir: str, mod: int | None = None):
    """Deterministic linked-pages dataset: each document becomes a page on
    host ``host{doc_id % 32}.example.com`` whose HTML carries three
    absolute outlinks to hosts ``host{(doc_id*7 + 13*j + 3) % 32}`` —
    pure integer functions of doc_id so the SQL oracle regenerates the
    SAME edges without parsing HTML, while the Ray path must recover them
    from the raw bytes (kernel regex parse, entity round-trip).

    ``mod`` keeps only pages with ``doc_id % mod == 0`` — a deterministic
    sparse subgraph for the reachability family (the full graph saturates
    at 32 hosts, so every pair would sit one hop apart)."""
    from ..kernel.htmlextract import synth_linked_page

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").combine_chunks().to_pylist()
        if mod is not None:
            ids = [d for d in ids if d % mod == 0]
        urls, htmls = [], []
        for d in ids:
            sb = d % LINK_HOST_BUCKETS
            url = f"https://host{sb}.example.com/d/{d}"
            links = []
            for j in range(1, LINKS_PER_PAGE + 1):
                db = (d * 7 + 13 * j + 3) % LINK_HOST_BUCKETS
                anchor = (
                    f"site {db}"
                    if j == 1
                    else (f"the {db} page" if j == 2 else f"host{db} home")
                )
                links.append((f"https://host{db}.example.com/t/{d}-{j}", anchor))
            urls.append(url)
            htmls.append(synth_linked_page(f"doc {d}", links, seq=d))
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "html": pa.array(htmls, type=pa.binary()),
            }
        )

    return _docs(sf_dir, columns=["doc_id"]).map_batches(
        build, batch_format="pyarrow"
    )


INFOBOX_ATTRS = ("population", "area", "language")
INFOBOX_MOD = 97
INFOBOX_SRC_MOD = 13  # provenance buckets for open-vocab fusion
INFOBOX_MIN_SOURCES = 6  # corroboration bar: >= 6 independent sources


def _infobox_pages(sf_dir: str, with_source: bool = False):
    """Deterministic infobox-bearing pages: doc_id -> 3 attribute-value
    facts, values pure integer functions of doc_id (value_j =
    'v{(doc_id*(j+2) + 5*j + 1) % 97} & co') so the SQL oracle regenerates
    the SAME facts arithmetically while the Ray path must recover them
    from raw bytes (comment decoys, <b>-wrapped cells, &amp; escapes).

    ``with_source`` adds a provenance column ``source = 'src' || doc_id %
    13`` (13 coprime to the 97 value modulus, so docs asserting the same
    fact land on distinct sources) feeding the open-vocabulary fusion
    queries."""
    from ..kernel.htmlextract import synth_infobox_page

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").combine_chunks().to_pylist()
        htmls = []
        for d in ids:
            facts = [
                (a, f"v{(d * (j + 2) + 5 * j + 1) % INFOBOX_MOD} & co")
                for j, a in enumerate(INFOBOX_ATTRS)
            ]
            htmls.append(synth_infobox_page(f"doc {d}", facts, seq=d))
        cols = {
            "doc_id": pa.array(ids, type=pa.int64()),
            "html": pa.array(htmls, type=pa.binary()),
        }
        if with_source:
            cols["source"] = pa.array(
                [f"src{d % INFOBOX_SRC_MOD}" for d in ids], type=pa.string()
            )
        return pa.table(cols)

    return _docs(sf_dir, columns=["doc_id"]).map_batches(build, batch_format="pyarrow")


def q_infobox_facts(sf_dir: str):
    """Semi-structured KG fact extraction from HTML infobox tables
    (stages/relations.infobox_facts over kernel extract_infobox)."""
    from ..stages.relations import infobox_facts

    return infobox_facts(_infobox_pages(sf_dir))


def sql_infobox_facts() -> str:
    attrs = ", ".join(f"'{a}'" for a in INFOBOX_ATTRS)
    return (
        f"SELECT doc_id,\n"
        f"       [{attrs}][j + 1] AS attr,\n"
        f"       'v' || CAST((doc_id * (j + 2) + 5 * j + 1) % {INFOBOX_MOD}"
        f" AS VARCHAR) || ' & co' AS value\n"
        f"FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) t"
    )


def _sql_infobox_facts_src_cte() -> str:
    """Shared CTE body: the infobox fact table with provenance, regenerated
    arithmetically (same formulas the synth pages encode in raw bytes)."""
    attrs = ", ".join(f"'{a}'" for a in INFOBOX_ATTRS)
    return (
        f"f AS (\n"
        f"  SELECT [{attrs}][j + 1] AS attr,\n"
        f"         'v' || CAST((doc_id * (j + 2) + 5 * j + 1) % {INFOBOX_MOD}"
        f" AS VARCHAR) || ' & co' AS value,\n"
        f"         'src' || CAST(doc_id % {INFOBOX_SRC_MOD} AS VARCHAR)"
        f" AS source\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) t)"
    )


def q_infobox_corroboration(sf_dir: str):
    """OPEN-VOCABULARY knowledge fusion over infobox extractions: per
    (attr, value) fact, how many distinct sources assert it, total
    assertions, and a corroborated flag (>= INFOBOX_MIN_SOURCES sources).
    Unlike `fact_corroboration` the fact key is open-world — nothing is
    broadcast or driver-collected (stages/canonicalize.fact_corroboration_open:
    combiner -> (fact, source) groupby -> fact groupby)."""
    from ..stages.canonicalize import fact_corroboration_open
    from ..stages.relations import infobox_facts

    facts = infobox_facts(
        _infobox_pages(sf_dir, with_source=True), carry_cols=["source"]
    )
    return fact_corroboration_open(
        facts, key_cols=["attr", "value"], min_sources=INFOBOX_MIN_SOURCES
    )


def sql_infobox_corroboration() -> str:
    return (
        f"WITH {_sql_infobox_facts_src_cte()}\n"
        f"SELECT attr, value,\n"
        f"       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,\n"
        f"       CAST(count(*) AS BIGINT) AS n_mentions,\n"
        f"       CAST(count(DISTINCT source) >= {INFOBOX_MIN_SOURCES}"
        f" AS BIGINT) AS corroborated\n"
        f"FROM f GROUP BY attr, value"
    )


def q_infobox_source_reliability(sf_dir: str):
    """Open-world source reliability: per source, distinct infobox facts
    asserted and how many are corroborated overall. broadcast_cap=0 forces
    the hash-partitioned keyed-JOIN fold (the 100 TB path) so the oracle
    checks the scale path, not the small-side broadcast shortcut."""
    from ..stages.canonicalize import source_reliability_open
    from ..stages.relations import infobox_facts

    facts = infobox_facts(
        _infobox_pages(sf_dir, with_source=True), carry_cols=["source"]
    )
    return source_reliability_open(
        facts,
        key_cols=["attr", "value"],
        min_sources=INFOBOX_MIN_SOURCES,
        broadcast_cap=0,
    )


def sql_infobox_source_reliability() -> str:
    return (
        f"WITH {_sql_infobox_facts_src_cte()},\n"
        f"ps AS (SELECT DISTINCT attr, value, source FROM f),\n"
        f"fc AS (SELECT attr, value, count(*) AS ns FROM ps"
        f" GROUP BY attr, value)\n"
        f"SELECT ps.source AS source,\n"
        f"       CAST(count(*) AS BIGINT) AS n_facts,\n"
        f"       CAST(sum(CASE WHEN fc.ns >= {INFOBOX_MIN_SOURCES} THEN 1"
        f" ELSE 0 END) AS BIGINT) AS n_corroborated\n"
        f"FROM ps JOIN fc USING (attr, value) GROUP BY ps.source"
    )


def q_host_link_graph(sf_dir: str):
    """Cross-host link graph parsed from raw page HTML: anchor extraction
    (comment/script-stripped regex over bytes), absolute-link host
    resolution, self-loop drop, then ONE host-pair groupby bounded by a
    per-batch combiner (stages/linkgraph.py). Relative template links
    (nav "/" "/about") must be filtered by the host rule — the oracle
    sees only the derived absolute edges."""
    from ..stages.linkgraph import host_link_graph

    return host_link_graph(_linked_pages(sf_dir))


def sql_host_link_graph() -> str:
    return (
        f"WITH l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t)\n"
        f"SELECT 'host' || CAST(sb AS VARCHAR) || '.example.com' AS src_host,\n"
        f"       'host' || CAST(db AS VARCHAR) || '.example.com' AS dst_host,\n"
        f"       CAST(count(*) AS BIGINT) AS n_links\n"
        f"FROM l WHERE sb <> db GROUP BY sb, db"
    )


def q_host_components(sf_dir: str):
    """Web-graph structure: weakly-connected components over the parsed
    cross-host link graph (min-bucket label; reuses the distributed
    min-label propagation of stages/graph_cc.connected_components)."""
    import pyarrow.compute as pc

    from ..stages.graph_cc import connected_components
    from ..stages.linkgraph import host_link_graph

    edges = host_link_graph(_linked_pages(sf_dir))

    def to_buckets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64())}
            )
        sb = pc.extract_regex(b.column("src_host"), r"host(?P<b>[0-9]+)")
        db = pc.extract_regex(b.column("dst_host"), r"host(?P<b>[0-9]+)")
        return pa.table(
            {
                "src": pc.struct_field(sb, "b").cast(pa.int64()),
                "dst": pc.struct_field(db, "b").cast(pa.int64()),
            }
        )

    cc = connected_components(edges.map_batches(to_buckets, batch_format="pyarrow"))

    def back_to_hosts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"host": pa.array([], type=pa.string()),
                 "component": pa.array([], type=pa.int64())}
            )
        hosts = pc.binary_join_element_wise(
            pa.array(["host"] * b.num_rows),
            b.column("node").cast(pa.string()),
            pa.array([".example.com"] * b.num_rows),
            "",
        )
        return pa.table({"host": hosts, "component": b.column("component")})

    return cc.map_batches(back_to_hosts, batch_format="pyarrow")


def sql_host_components() -> str:
    return (
        f"WITH RECURSIVE l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t),\n"
        f"e AS (SELECT DISTINCT sb, db FROM l WHERE sb <> db),\n"
        f"edges AS (SELECT sb AS src, db AS dst FROM e\n"
        f"  UNION ALL SELECT db, sb FROM e),\n"
        f"nodes AS (SELECT DISTINCT src AS n FROM edges),\n"
        f"reach(node, lab) AS (\n"
        f"  SELECT n, n FROM nodes\n"
        f"  UNION\n"
        f"  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node)\n"
        f"SELECT 'host' || CAST(node AS VARCHAR) || '.example.com' AS host,\n"
        f"       CAST(min(lab) AS BIGINT) AS component\n"
        f"FROM reach GROUP BY node"
    )


def q_host_authority(sf_dir: str):
    """Host authority: DIRECTED link-volume-weighted integer PageRank over
    the parsed cross-host link graph (stages/graph_cc.weighted_pagerank —
    mass flows along links proportional to each edge's share of the
    source host's outgoing link volume)."""
    from ray.data.aggregate import Count

    from ..stages.graph_cc import _project_t, weighted_pagerank
    from ..stages.linkgraph import host_link_graph

    edges = host_link_graph(_linked_pages(sf_dir)).materialize()
    st = {"node": pa.string()}
    nodes = (
        _project_t(edges, {"node": "src_host"}, st)
        .union(_project_t(edges, {"node": "dst_host"}, st))
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
    )
    nodes = _project_t(nodes, {"node": "node"}, st)
    wpr = weighted_pagerank(
        edges,
        nodes=nodes,
        src_col="src_host",
        dst_col="dst_host",
        weight_col="n_links",
        node_type=pa.string(),
    )
    return _project_t(
        wpr, {"host": "node", "pr_score": "pr_score"}, {"host": pa.string()}
    )


def sql_host_authority(n_iters: int = 3) -> str:
    pr_scale = 10**12
    base = (15 * pr_scale) // 100
    sql = (
        f"WITH l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t),\n"
        f"e AS (SELECT sb, db, count(*) AS w FROM l WHERE sb <> db GROUP BY sb, db),\n"
        f"sw AS (SELECT sb AS s, sum(w) AS sw FROM e GROUP BY sb),\n"
        f"nodes AS (SELECT DISTINCT sb AS n FROM e UNION SELECT DISTINCT db FROM e),\n"
        f"s0 AS (SELECT n AS node, CAST({pr_scale} AS BIGINT) AS sc FROM nodes)"
    )
    for i in range(1, n_iters + 1):
        sql += (
            f",\ns{i} AS (\n"
            f"  SELECT nd.n AS node,\n"
            f"    CAST({base} + (85 * COALESCE(x.inc, 0)) // 100 AS BIGINT) AS sc\n"
            f"  FROM nodes nd LEFT JOIN (\n"
            f"    SELECT e.db AS node, SUM((p.sc * e.w) // g.sw) AS inc\n"
            f"    FROM e JOIN s{i - 1} p ON p.node = e.sb\n"
            f"    JOIN sw g ON g.s = e.sb\n"
            f"    GROUP BY e.db) x ON x.node = nd.n)"
        )
    sql += (
        f"\nSELECT 'host' || CAST(node AS VARCHAR) || '.example.com' AS host,\n"
        f"       sc AS pr_score FROM s{n_iters}"
    )
    return sql


def q_host_hits(sf_dir: str, n_iters: int = 2):
    """Host hubs & authorities: integer fixed-point HITS over the parsed
    cross-host link graph (stages/graph_cc.hits_scores — link-volume
    weighted, each half-step max-normalized by the exact integer rule so
    the unrolled SQL oracle compares value-exact). Complements
    host_authority's PageRank: HITS separates 'points at good pages'
    (hub) from 'is pointed at by good hubs' (authority)."""
    from ray.data.aggregate import Count

    from ..stages.graph_cc import _project_t, hits_scores
    from ..stages.linkgraph import host_link_graph

    edges = host_link_graph(_linked_pages(sf_dir)).materialize()
    st = {"node": pa.string()}
    nodes = (
        _project_t(edges, {"node": "src_host"}, st)
        .union(_project_t(edges, {"node": "dst_host"}, st))
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
    )
    nodes = _project_t(nodes, {"node": "node"}, st)
    out = hits_scores(
        edges,
        nodes=nodes,
        src_col="src_host",
        dst_col="dst_host",
        weight_col="n_links",
        node_type=pa.string(),
        n_iters=n_iters,
    )
    return _project_t(
        out,
        {"host": "node", "hub_score": "hub_score", "auth_score": "auth_score"},
        {"host": pa.string()},
    )


def sql_host_hits(n_iters: int = 2) -> str:
    from ..stages.graph_cc import HITS_SCALE

    sql = (
        f"WITH l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t),\n"
        f"e AS (SELECT sb, db, CAST(count(*) AS BIGINT) AS w FROM l\n"
        f"  WHERE sb <> db GROUP BY sb, db),\n"
        f"nodes AS (SELECT DISTINCT sb AS n FROM e UNION SELECT DISTINCT db FROM e),\n"
        f"h0 AS (SELECT n AS node, CAST({HITS_SCALE} AS BIGINT) AS sc FROM nodes)"
    )
    for i in range(1, n_iters + 1):
        prev_h = f"h{i - 1}"
        sql += (
            f",\nar{i} AS (SELECT e.db AS node, SUM(p.sc * e.w) AS raw\n"
            f"  FROM e JOIN {prev_h} p ON p.node = e.sb GROUP BY e.db),\n"
            f"a{i} AS (SELECT nd.n AS node,\n"
            f"  CAST(COALESCE(ar.raw, 0) //\n"
            f"    ((SELECT COALESCE(max(raw), 0) FROM ar{i}) // {HITS_SCALE} + 1) AS BIGINT) AS sc\n"
            f"  FROM nodes nd LEFT JOIN ar{i} ar ON ar.node = nd.n),\n"
            f"hr{i} AS (SELECT e.sb AS node, SUM(p.sc * e.w) AS raw\n"
            f"  FROM e JOIN a{i} p ON p.node = e.db GROUP BY e.sb),\n"
            f"h{i} AS (SELECT nd.n AS node,\n"
            f"  CAST(COALESCE(hr.raw, 0) //\n"
            f"    ((SELECT COALESCE(max(raw), 0) FROM hr{i}) // {HITS_SCALE} + 1) AS BIGINT) AS sc\n"
            f"  FROM nodes nd LEFT JOIN hr{i} hr ON hr.node = nd.n)"
        )
    sql += (
        f"\nSELECT 'host' || CAST(h.node AS VARCHAR) || '.example.com' AS host,\n"
        f"  h.sc AS hub_score, a.sc AS auth_score\n"
        f"FROM h{n_iters} h JOIN a{n_iters} a ON a.node = h.node"
    )
    return sql


def q_host_degrees(sf_dir: str):
    """Per-host web-graph degrees over the parsed link graph: distinct
    out/in neighbor counts + outgoing/incoming link volume, via a
    tag-union of the edge list's two sides (one dimension-bounded
    groupby)."""
    from ..stages.linkgraph import host_degrees, host_link_graph

    return host_degrees(host_link_graph(_linked_pages(sf_dir)))


def sql_host_degrees() -> str:
    return (
        f"WITH l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t),\n"
        f"e AS (\n"
        f"  SELECT 'host' || CAST(sb AS VARCHAR) || '.example.com' AS src_host,\n"
        f"         'host' || CAST(db AS VARCHAR) || '.example.com' AS dst_host,\n"
        f"         CAST(count(*) AS BIGINT) AS n_links\n"
        f"  FROM l WHERE sb <> db GROUP BY sb, db),\n"
        f"u AS (\n"
        f"  SELECT src_host AS host, 1 AS out_deg, n_links AS out_links,\n"
        f"         0 AS in_deg, 0 AS in_links FROM e\n"
        f"  UNION ALL\n"
        f"  SELECT dst_host AS host, 0, 0, 1, n_links FROM e)\n"
        f"SELECT host, CAST(sum(out_deg) AS BIGINT) AS out_deg,\n"
        f"       CAST(sum(out_links) AS BIGINT) AS out_links,\n"
        f"       CAST(sum(in_deg) AS BIGINT) AS in_deg,\n"
        f"       CAST(sum(in_links) AS BIGINT) AS in_links\n"
        f"FROM u GROUP BY host"
    )


def q_host_pagerank(sf_dir: str, n_iters: int = 3):
    """Web-graph PageRank over the parsed host link graph: the HTML-derived
    cross-host edges (q_host_link_graph) canonicalized to undirected
    distinct pairs, then the integer fixed-point power iteration
    (stages/graph_cc.pagerank — damping 0.85, 10^-12-unit scores,
    bit-deterministic at any parallelism). The host graph is
    dimension-bounded (hosts << pages), so the distinct-pair reduction
    and per-iteration joins are tiny next to the page scan."""
    from ray.data.aggregate import Count

    from ..stages.graph_cc import _project_t, pagerank
    from ..stages.linkgraph import host_link_graph

    edges = host_link_graph(_linked_pages(sf_dir))

    def undirected(b: pa.Table) -> pa.Table:
        s = b.column("src_host").combine_chunks()
        d = b.column("dst_host").combine_chunks()
        return pa.table(
            {"src": pc.min_element_wise(s, d), "dst": pc.max_element_wise(s, d)}
        )

    e = (
        edges.map_batches(undirected, batch_format="pyarrow")
        .groupby(["src", "dst"], num_partitions=4)
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    nodes = (
        e.map_batches(
            lambda b: pa.table({"host": b.column("src")}), batch_format="pyarrow"
        )
        .union(
            e.map_batches(
                lambda b: pa.table({"host": b.column("dst")}), batch_format="pyarrow"
            )
        )
        .groupby("host", num_partitions=4)
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    pr = pagerank(
        e,
        nodes=nodes,
        src_col="src",
        dst_col="dst",
        node_col="host",
        node_type=pa.string(),
        n_iters=n_iters,
    )
    return _project_t(pr, {"host": "node", "pr_score": "pr_score"}, {"host": pa.string()})


def sql_host_pagerank(n_iters: int = 3) -> str:
    pr_scale = 10**12
    base = (15 * pr_scale) // 100
    sql = (
        f"WITH l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t),\n"
        f"e0 AS (SELECT DISTINCT least(sb, db) AS sb, greatest(sb, db) AS db\n"
        f"       FROM l WHERE sb <> db),\n"
        f"e AS (SELECT 'host' || CAST(sb AS VARCHAR) || '.example.com' AS s0,\n"
        f"             'host' || CAST(db AS VARCHAR) || '.example.com' AS d0\n"
        f"      FROM e0),\n"
        f"und AS MATERIALIZED (SELECT s0 AS s, d0 AS d FROM e\n"
        f"  UNION ALL SELECT d0, s0 FROM e),\n"
        f"deg AS MATERIALIZED (SELECT s AS node, count(*) AS deg FROM und GROUP BY s),\n"
        f"nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM und),\n"
        f"s0 AS (SELECT node, CAST({pr_scale} AS BIGINT) AS sc FROM nodes)"
    )
    for i in range(n_iters):
        sql += (
            f",\ns{i + 1} AS (\n"
            f"  SELECT n.node,\n"
            f"    CAST({base} + (85 * COALESCE(x.inc, 0)) // 100 AS BIGINT) AS sc\n"
            f"  FROM nodes n LEFT JOIN (\n"
            f"    SELECT u.d AS node, SUM(p.sc // g.deg) AS inc\n"
            f"    FROM und u JOIN s{i} p ON p.node = u.s JOIN deg g ON g.node = u.s\n"
            f"    GROUP BY u.d) x ON x.node = n.node)"
        )
    sql += f"\nSELECT node AS host, sc AS pr_score FROM s{n_iters}"
    return sql


def q_anchor_aliases(sf_dir: str):
    """Anchor-text alias mining over the parsed link graph: cross-host
    anchors aggregated to (dst_host, anchor, n_refs) — the alias-candidate
    table a web-scale canonicalizer feeds from (anchor text is how other
    sites NAME the target). The Ray path must recover the anchors from
    raw HTML (entity unescape, inner-tag strip); the oracle regenerates
    the derived (host, anchor) pairs arithmetically."""
    from ..stages.linkgraph import anchor_stats

    return anchor_stats(_linked_pages(sf_dir))


def sql_anchor_aliases() -> str:
    return (
        f"WITH l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db, j\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t)\n"
        f"SELECT 'host' || CAST(db AS VARCHAR) || '.example.com' AS dst_host,\n"
        f"       CASE j WHEN 1 THEN 'site ' || CAST(db AS VARCHAR)\n"
        f"              WHEN 2 THEN 'the ' || CAST(db AS VARCHAR) || ' page'\n"
        f"              ELSE 'host' || CAST(db AS VARCHAR) || ' home' END AS anchor,\n"
        f"       CAST(count(*) AS BIGINT) AS n_refs\n"
        f"FROM l WHERE sb <> db GROUP BY db, j"
    )


# --- canonical-URL dedup -------------------------------------------------------


def _messy_urls(sf_dir: str):
    """Deterministic messy-URL fixture: docs 2k and 2k+1 get DIFFERENTLY
    messy URLs (case noise, default port, tracking params, scrambled param
    order, trailing slash, fragment) that canonicalize to the SAME
    canonical URL of page k — so canonical dedup must merge exactly the
    even/odd pairs. Pure integer functions of doc_id; the oracle derives
    the canonical form arithmetically while the Ray path must actually
    normalize the mess."""

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").combine_chunks().to_pylist()
        urls = []
        for d in ids:
            u = d // 2
            hb = u % LINK_HOST_BUCKETS
            if d % 2 == 0:
                urls.append(
                    f"http://Host{hb}.Example.com:80/p/{u}?b=2&a=1&utm_source=x#sec"
                )
            else:
                urls.append(f"HTTP://host{hb}.example.COM/p/{u}/?a=1&b=2&fbclid=zzz")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "url": pa.array(urls, type=pa.string()),
            }
        )

    return _docs(sf_dir, columns=["doc_id"]).map_batches(build, batch_format="pyarrow")


def q_canonical_urls(sf_dir: str):
    """URL canonicalization over a messy crawl-URL fixture: lowercase
    scheme/host, default-port strip, fragment drop, tracking-param
    removal, bytewise param sort, trailing-slash strip
    (stages/urlfilter.canonical_url). Zero shuffles."""
    from ..stages.urlfilter import add_canonical_url

    return add_canonical_url(_messy_urls(sf_dir)).select_columns(
        ["doc_id", "canon_url"]
    )


def sql_canonical_urls() -> str:
    return (
        f"SELECT doc_id,\n"
        f"  'http://host' || CAST((doc_id // 2) % {LINK_HOST_BUCKETS} AS VARCHAR)\n"
        f"  || '.example.com/p/' || CAST(doc_id // 2 AS VARCHAR) || '?a=1&b=2'\n"
        f"  AS canon_url\n"
        f"FROM documents"
    )


def q_url_dedup(sf_dir: str):
    """Crawl dedup by canonical URL: canonicalize, then ONE groupby on the
    canonical key keeping the lowest doc_id + the duplicate count (the
    even/odd messy pairs must merge; the canonical key is uniform by
    construction, no hot reducer)."""
    from ray.data.aggregate import Count, Min

    from ..stages.urlfilter import add_canonical_url

    ds = add_canonical_url(_messy_urls(sf_dir))
    return ds.groupby("canon_url").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_dupes"),
    )


def sql_url_dedup() -> str:
    return (
        f"WITH c AS (\n"
        f"  SELECT doc_id,\n"
        f"    'http://host' || CAST((doc_id // 2) % {LINK_HOST_BUCKETS} AS VARCHAR)\n"
        f"    || '.example.com/p/' || CAST(doc_id // 2 AS VARCHAR) || '?a=1&b=2'\n"
        f"    AS canon_url\n"
        f"  FROM documents)\n"
        f"SELECT canon_url, min(doc_id) AS keep_doc_id,\n"
        f"  CAST(count(*) AS BIGINT) AS n_dupes\n"
        f"FROM c GROUP BY canon_url"
    )


def q_skew_join(sf_dir: str):
    """Skew-aware hybrid join (stages/skewjoin.py): events carry a
    deterministically SKEWED key (every user_id divisible by 3 collapses
    onto key 7 — one key owns ~36% of all rows, the north-rule hot-entity
    shape), joined to customer names on that key. Misra-Gries detection
    routes key 7 through the broadcast path (zero shuffle for the hot
    third of the stream) while the ~100 cold keys take the md5-bucketed
    hash join. The threshold scales with the input (n/10) so the same
    query exercises both paths at every sf."""
    import pyarrow.parquet as pq_

    from ..stages.skewjoin import skew_join

    n_events = pq_.read_metadata(
        os.path.join(sf_dir, "events.parquet")
    ).num_rows

    def derive(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").combine_chunks()
        # user_id % 3 == 0 -> 7 else user_id (u - 3*(u//3); user_id >= 0)
        rem = pc.subtract(uid, pc.multiply(pc.divide(uid, 3), 3))
        key = pc.if_else(pc.equal(rem, 0), pa.scalar(7, type=pa.int64()), uid)
        return pa.table({"skkey": key, "event_id": b.column("event_id")})

    left = _events(sf_dir, columns=["event_id", "user_id"]).map_batches(
        derive, batch_format="pyarrow"
    )

    def dim(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").combine_chunks()
        keep = pc.less(k, pa.scalar(150, type=pa.int64()))
        t = b.filter(keep)
        return pa.table(
            {
                "skkey": t.column("c_custkey").combine_chunks(),
                "cust_name": t.column("c_name").combine_chunks(),
            }
        )

    import ray.data as rd

    right = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    ).map_batches(dim, batch_format="pyarrow")
    return skew_join(
        left,
        right,
        on="skkey",
        hot_threshold=max(64, n_events // 10),
        left_types={"skkey": pa.int64(), "event_id": pa.int64()},
        right_types={"skkey": pa.int64(), "cust_name": pa.string()},
    )


def sql_skew_join() -> str:
    return (
        "SELECT CASE WHEN user_id % 3 = 0 THEN 7 ELSE user_id END AS skkey,\n"
        "  event_id, c_name AS cust_name\n"
        "FROM events\n"
        "JOIN customer ON c_custkey =\n"
        "  CASE WHEN user_id % 3 = 0 THEN 7 ELSE user_id END\n"
        "WHERE c_custkey < 150"
    )


def q_pq_codes(sf_dir: str):
    """Product-quantization encode (stages/pq.py): each 64-dim embedding
    compressed to 4 subspace cell ids against the SEEDED codebooks (the
    oracle config — trained codebooks are the tests-pinned path).
    Zero-shuffle map_batches; codebooks broadcast once."""
    import ray.data as rd

    from ..stages.pq import pq_codebooks, pq_encode

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return pq_encode(ds, pq_codebooks())


def sql_pq_codes_q() -> str:
    from ..stages.pq import sql_pq_codes

    return sql_pq_codes()


def q_pq_topk(sf_dir: str):
    """ADC top-k search over the PQ-coded corpus: per-batch LUT gather +
    k-bounded local top-k combiner, one k-row global sort. Bit-exact
    float oracle (dimension-order accumulation on both engines)."""
    import ray.data as rd

    from ..stages.pq import pq_codebooks, pq_encode, pq_query_vector, pq_topk

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    cbs = pq_codebooks()
    return pq_topk(pq_encode(ds, cbs), cbs, pq_query_vector())


def sql_pq_topk_q() -> str:
    from ..stages.pq import sql_pq_topk

    return sql_pq_topk()


def q_kg_sameas_rewrite(sf_dir: str):
    """owl:sameAs dereferencing applied to the triple stream: every
    mention's object is rewritten to its identity cluster's REPRESENTATIVE
    surface (lexicographic min inside the q_entity_sameas multi-key
    closure), then the rewritten (subj, pred, obj_canon) triples are
    re-aggregated — the KG-consolidation step that makes "u.s." /
    "u s" / "us" one node. The surface->representative map is
    gazetteer-bounded: collected once driver-side, broadcast via ray.put,
    applied per batch with pc.index_in/take; the only exchange is the
    final combiner-preceded 3-key groupby."""
    import ray
    from ray.data.aggregate import Count, Min, Sum

    from ..stages.canonicalize import canonical_entities
    from ..stages.collect import collect_blocks

    surf = (
        canonical_entities(mentions_dataset(sf_dir))
        .select_columns(["surface_norm"])
        .groupby("surface_norm")
        .aggregate(Count(alias_name="_c"))
    )
    comp = sameas_components(surf)
    rep = comp.groupby("sameas_component").aggregate(
        Min("surface_norm", alias_name="rep")
    )
    comp_tab = collect_blocks(
        comp,
        "surface_norm",
        pa.table(
            {
                "surface_norm": pa.array([], type=pa.string()),
                "sameas_component": pa.array([], type=pa.int64()),
            }
        ),
    )
    rep_tab = collect_blocks(
        rep,
        "rep",
        pa.table(
            {
                "sameas_component": pa.array([], type=pa.int64()),
                "rep": pa.array([], type=pa.string()),
            }
        ),
    )
    # surface -> representative, one bounded driver join
    idx = pc.index_in(
        comp_tab.column("sameas_component"), value_set=rep_tab.column("sameas_component").combine_chunks()
    )
    surf_arr = comp_tab.column("surface_norm").combine_chunks()
    rep_arr = rep_tab.column("rep").combine_chunks().take(idx)
    map_ref = ray.put((surf_arr, rep_arr))

    m = mentions_dataset(sf_dir)

    def rewrite(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "subj": pa.array([], type=pa.string()),
                "pred": pa.array([], type=pa.string()),
                "obj_canon": pa.array([], type=pa.string()),
                "n_mentions": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        sa, ra = ray.get(map_ref)
        sn = b.column("surface_norm")
        if isinstance(sn, pa.ChunkedArray):
            sn = sn.combine_chunks()
        obj = ra.take(pc.index_in(sn, value_set=sa))
        t = pa.table(
            {
                "subj": b.column("doc_id").cast(pa.string()),
                "pred": b.column("label"),
                "obj_canon": obj,
            }
        )
        # per-batch partial counts bound the shuffle to distinct triples/batch
        g = t.group_by(["subj", "pred", "obj_canon"]).aggregate(
            [("obj_canon", "count")]
        )
        return pa.table(
            {
                "subj": g.column("subj"),
                "pred": g.column("pred"),
                "obj_canon": g.column("obj_canon"),
                "n_mentions": g.column("obj_canon_count").cast(pa.int64()),
            }
        )

    return (
        m.map_batches(rewrite, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj_canon"])
        .aggregate(Sum("n_mentions", alias_name="n_mentions"))
    )


def _sql_sameas_chain() -> str:
    """Shared CTE chain: acc -> distinct surfaces -> multi-key blocking
    edges -> transitive reach -> (surface_norm, c) component map."""
    from .ner_oracle import sql_match_ctes

    return (
        f"{sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"ce AS (SELECT pname AS surface_norm FROM acc GROUP BY pname),\n"
        f"n AS (SELECT surface_norm, {SIGNED_WRAP} AS sid,\n"
        f"  regexp_replace(surface_norm, '[^a-z0-9]', '', 'g') AS k1,\n"
        f"  regexp_extract(surface_norm, '^[^ ]+') AS k2 FROM ce),\n"
        f"e1 AS (SELECT n.sid AS src, m.msid AS dst FROM n JOIN\n"
        f"  (SELECT k1, min(sid) AS msid FROM n GROUP BY k1) m ON m.k1 = n.k1),\n"
        f"e2 AS (SELECT n.sid AS src, m.msid AS dst FROM n JOIN\n"
        f"  (SELECT k2, min(sid) AS msid FROM n GROUP BY k2) m ON m.k2 = n.k2),\n"
        f"edges0 AS (SELECT src, dst FROM e1 UNION SELECT src, dst FROM e2),\n"
        f"edges AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),\n"
        f"reach(node, lab) AS (\n"
        f"  SELECT sid, sid FROM n\n"
        f"  UNION\n"
        f"  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),\n"
        f"comp AS (SELECT n.surface_norm, CAST(min(r.lab) AS BIGINT) AS c\n"
        f"  FROM n JOIN reach r ON r.node = n.sid GROUP BY n.surface_norm)"
    )


def sql_kg_sameas_rewrite() -> str:
    return (
        f"WITH RECURSIVE {_sql_sameas_chain()},\n"
        f"rep AS (SELECT c, min(surface_norm) AS rep FROM comp GROUP BY c),\n"
        f"map AS (SELECT comp.surface_norm, rep.rep FROM comp\n"
        f"  JOIN rep ON rep.c = comp.c)\n"
        f"SELECT CAST(doc_id AS VARCHAR) AS subj, plabel AS pred,\n"
        f"  map.rep AS obj_canon, count(*) AS n_mentions\n"
        f"FROM acc JOIN map ON map.surface_norm = acc.pname\n"
        f"GROUP BY 1, 2, 3"
    )


def q_host_scc(sf_dir: str):
    """Web-graph STRONGLY connected components over the parsed directed
    cross-host link graph (stages/scc.py: size-gated Tarjan / FW-BW
    coloring; the directed counterpart of q_host_components — the
    "bowtie core" structure of a crawl). scc = min member host bucket,
    value-exact against the mutual-reachability recursive-CTE oracle."""
    from ..stages.linkgraph import host_link_graph
    from ..stages.scc import strongly_connected_components

    edges = host_link_graph(_linked_pages(sf_dir))

    def to_buckets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64())}
            )
        sb = pc.extract_regex(b.column("src_host"), r"host(?P<b>[0-9]+)")
        db = pc.extract_regex(b.column("dst_host"), r"host(?P<b>[0-9]+)")
        return pa.table(
            {
                "src": pc.struct_field(sb, "b").cast(pa.int64()),
                "dst": pc.struct_field(db, "b").cast(pa.int64()),
            }
        )

    out = strongly_connected_components(
        edges.map_batches(to_buckets, batch_format="pyarrow")
    )

    def back_to_hosts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"host": pa.array([], type=pa.string()),
                 "scc": pa.array([], type=pa.int64())}
            )
        hosts = pc.binary_join_element_wise(
            pa.array(["host"] * b.num_rows),
            b.column("node").cast(pa.string()),
            pa.array([".example.com"] * b.num_rows),
            "",
        )
        return pa.table({"host": hosts, "scc": b.column("scc")})

    return out.map_batches(back_to_hosts, batch_format="pyarrow")


def sql_host_scc() -> str:
    return (
        f"WITH RECURSIVE l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t),\n"
        f"e AS (SELECT DISTINCT sb, db FROM l WHERE sb <> db),\n"
        f"nodes AS (SELECT DISTINCT sb AS x FROM e\n"
        f"  UNION SELECT DISTINCT db FROM e),\n"
        f"reach(a, b) AS (\n"
        f"  SELECT x, x FROM nodes\n"
        f"  UNION\n"
        f"  SELECT r.a, e.db FROM reach r JOIN e ON e.sb = r.b)\n"
        f"SELECT 'host' || CAST(r1.a AS VARCHAR) || '.example.com' AS host,\n"
        f"       CAST(min(r1.b) AS BIGINT) AS scc\n"
        f"FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a\n"
        f"GROUP BY r1.a"
    )


def _triples_half(sf_dir: str, parity: int):
    """Triples of one crawl half (subj doc_id parity) — the two federated
    'endpoints' of q_kg_sparql_service."""

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        ids = pc.cast(b.column("subj"), pa.int64())
        rem = pc.subtract(ids, pc.multiply(pc.divide(ids, 2), 2))
        return b.filter(pc.equal(rem, pa.scalar(parity, type=pa.int64())))

    return q_triples(sf_dir).map_batches(keep, batch_format="pyarrow")


def q_kg_sparql_service(sf_dir: str):
    """SPARQL 1.1 federation (SERVICE): the even-doc crawl partition is
    the local endpoint, the odd-doc partition the remote one; for every
    SYSTEM entity seen locally, count its REMOTE mention docs. The local
    side is pre-aggregated to distinct entities by a subquery (the
    gazetteer-bounded side) BEFORE the federation join, so the exchange
    is linear in remote mentions — the naive doc-x-doc pair count is
    quadratic in corpus size for hot entities and was measured spilling
    at sf1. The SERVICE group evaluates against the remote triples source
    only (kernel/sparql.py service_sources) and its bindings join the
    outer group on the shared ?e via the bucketed hash join — the same
    machinery a two-store federated endpoint uses
    (serving.sparql_select(..., service_sources={...}))."""
    from ..kernel.sparql import run_select

    query = """
      SELECT ?e (COUNT(?rdoc) AS ?n) WHERE {
        { SELECT ?e WHERE { ?ld :SYSTEM ?e . } }
        SERVICE :odd { ?rdoc :SYSTEM ?e . }
      } GROUP BY ?e
    """
    return run_select(
        _triples_half(sf_dir, 0),
        query,
        service_sources={"odd": _triples_half(sf_dir, 1)},
    )


def sql_kg_sparql_service() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        f"b AS (SELECT DISTINCT o.eid AS e,\n"
        f"    CAST(o.doc_id AS VARCHAR) AS rdoc\n"
        f"  FROM acc o\n"
        f"  WHERE o.plabel = 'SYSTEM' AND o.doc_id % 2 = 1\n"
        f"    AND EXISTS (SELECT 1 FROM acc s WHERE s.plabel = 'SYSTEM'\n"
        f"      AND s.eid = o.eid AND s.doc_id % 2 = 0))\n"
        f"SELECT e, count(*) AS n FROM b GROUP BY e"
    )


def q_textrank_summaries(sf_dir: str):
    """TextRank extractive summarization (stages/textrank.py): the
    top-ranked sentence per document by the exact-integer damped walk on
    the shared-word sentence graph. Document-local, ONE zero-shuffle
    map_batches pass; oracle is the fully unrolled fixed-point SQL."""
    from ..stages.textrank import textrank_top_sentences

    return textrank_top_sentences(_docs(sf_dir, columns=["doc_id", "text"]))


def sql_textrank_summaries() -> str:
    from ..stages.textrank import sql_textrank

    return sql_textrank()


def q_host_centrality(sf_dir: str):
    """Harmonic closeness centrality over the sparse web host graph
    (stages/centrality.py): a deterministic 4-seed panel of BFS sweeps,
    hop-bounded at 3, exact-integer SCALE//d contributions — the
    sampled-closeness shape that replaces O(n) sweeps at web scale.
    Runs on the doc_id % 23 == 0 subgraph so distances spread."""
    from ..stages.centrality import harmonic_centrality
    from ..stages.linkgraph import host_link_graph

    edges = host_link_graph(_linked_pages(sf_dir, mod=PATH_DOC_MOD))

    def to_buckets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64())}
            )
        sb = pc.extract_regex(b.column("src_host"), r"host(?P<b>[0-9]+)")
        db = pc.extract_regex(b.column("dst_host"), r"host(?P<b>[0-9]+)")
        return pa.table(
            {
                "src": pc.struct_field(sb, "b").cast(pa.int64()),
                "dst": pc.struct_field(db, "b").cast(pa.int64()),
            }
        )

    out = harmonic_centrality(
        edges.map_batches(to_buckets, batch_format="pyarrow")
    )

    def back_to_hosts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"host": pa.array([], type=pa.string()),
                 "centrality": pa.array([], type=pa.int64())}
            )
        hosts = pc.binary_join_element_wise(
            pa.array(["host"] * b.num_rows),
            b.column("node").cast(pa.string()),
            pa.array([".example.com"] * b.num_rows),
            "",
        )
        return pa.table({"host": hosts, "centrality": b.column("centrality")})

    return out.map_batches(back_to_hosts, batch_format="pyarrow")


def sql_host_centrality() -> str:
    from ..stages.centrality import CENT_SCALE

    return (
        f"WITH RECURSIVE l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t\n"
        f"  WHERE doc_id % {PATH_DOC_MOD} = 0),\n"
        f"e0 AS (SELECT DISTINCT sb, db FROM l WHERE sb <> db),\n"
        f"e AS (SELECT sb AS src, db AS dst FROM e0\n"
        f"  UNION SELECT db, sb FROM e0),\n"
        f"nodes AS (SELECT DISTINCT src AS n FROM e),\n"
        f"seeds AS (SELECT n AS s FROM nodes ORDER BY n LIMIT 4),\n"
        f"r(s, n, d) AS (\n"
        f"  SELECT s, s, 0 FROM seeds\n"
        f"  UNION\n"
        f"  SELECT r.s, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.n\n"
        f"  WHERE r.d < 3),\n"
        f"md AS (SELECT s, n, min(d) AS d FROM r GROUP BY s, n)\n"
        f"SELECT 'host' || CAST(n AS VARCHAR) || '.example.com' AS host,\n"
        f"  CAST(SUM(CASE WHEN d > 0 THEN {CENT_SCALE} // d ELSE 0 END)\n"
        f"    AS BIGINT) AS centrality\n"
        f"FROM md GROUP BY n"
    )


def _ttl_shards(sf_dir: str) -> str:
    """Deterministic Turtle fixture: one .ttl shard per 1000 docs, each
    doc a prefixed multi-predicate statement (';' and ',' continuations,
    @prefix scoping — the constructs the reader must honor). Content is
    pure doc_id arithmetic so the oracle regenerates it in SQL. Cached in
    /tmp keyed on the documents fingerprint (crash-safe: temp dir +
    atomic rename, done-marker OUTSIDE the shard dir so read_binary_files
    never sees it)."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq_

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{os.path.realpath(src)}:{st.st_size}:{st.st_mtime_ns}:ttl1".encode()
    ).hexdigest()[:12]
    d = f"/tmp/quickner_ray_ttl_{fp}"
    done = d + ".done"
    if os.path.exists(done) and os.path.isdir(d):
        return d
    n = pq_.read_metadata(src).num_rows
    tmp = d + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for lo in range(0, n, 1000):
        lines = ["@prefix : <urn:q:> .", "@prefix ex: <http://ex.org/> ."]
        for did in range(lo, min(lo + 1000, n)):
            lines.append(
                f":doc{did} ex:links_to :host{did % LINK_HOST_BUCKETS} ;"
                f' ex:snap "s{did % 5}" .'
            )
        with open(os.path.join(tmp, f"part-{lo // 1000:05d}.ttl"), "w") as f:
            f.write("\n".join(lines) + "\n")
    shutil.rmtree(d, ignore_errors=True)
    os.rename(tmp, d)
    with open(done, "w") as f:
        f.write("ok")
    return d


def q_kg_sparql_load(sf_dir: str):
    """SPARQL UPDATE ``LOAD`` round-trip over the LSM store: the base
    store holds only the fixture's ex:snap triples; ONE ``LOAD <dir>``
    request stream-parses every .ttl shard (one parse task per file) and
    merges BOTH predicates as one delta generation. Post-load, the POS
    lookups must show ex:snap at support 2 (base + load — LOAD is
    additive, like INSERT DATA) and ex:links_to at support 1; the oracle
    regenerates both from doc_id arithmetic. Applied once per cached
    store (delta-roster guard)."""
    from ..serving import sparql_update
    from ..sinks.triplestore import _delta_dirs, lookup, write_triple_store
    from ..sources.turtle import read_turtle

    shards = _ttl_shards(sf_dir)
    store = f"/tmp/quickner_ray_tstore_load_{_corpus_cache_key(sf_dir, 'v1')}"
    need = [
        p for p in ("spo", "pos")
        if not os.path.exists(os.path.join(store, p, "_DONE"))
    ]
    if need:
        base = read_turtle(shards).map_batches(
            lambda b: b.filter(
                pc.equal(b.column("pred"), pa.scalar("http://ex.org/snap"))
            ),
            batch_format="pyarrow",
        )
        write_triple_store(base, store, perms=need)
    if not _delta_dirs(os.path.join(store, "pos")):
        sparql_update(store, f"LOAD <file://{shards}>", perms=["spo", "pos"])
    return lookup(store, "pred", "http://ex.org/snap").union(
        lookup(store, "pred", "http://ex.org/links_to")
    )


def sql_kg_sparql_load() -> str:
    return (
        "SELECT 'urn:q:doc' || CAST(doc_id AS VARCHAR) AS subj,\n"
        "  'http://ex.org/snap' AS pred,\n"
        "  's' || CAST(doc_id % 5 AS VARCHAR) AS obj,\n"
        "  CAST(2 AS BIGINT) AS n_mentions\n"
        "FROM documents\n"
        "UNION ALL\n"
        "SELECT 'urn:q:doc' || CAST(doc_id AS VARCHAR),\n"
        "  'http://ex.org/links_to',\n"
        f"  'urn:q:host' || CAST(doc_id % {LINK_HOST_BUCKETS} AS VARCHAR),\n"
        "  CAST(1 AS BIGINT)\n"
        "FROM documents"
    )


def q_kg_sparql_clear(sf_dir: str):
    """``CLEAR ALL`` round-trip: a corpus-sized base store is cleared by
    ONE delta generation negating every key's net support (|store| work —
    inherent to CLEAR), then repopulated with INSERT DATA; the POS lookup
    must see ONLY the re-inserted rows (every cleared key folds to zero
    through the delta-aware read). Oracle = the literal inserted rows.
    Applied once per cached store (delta-roster guard)."""
    from ..serving import sparql_update
    from ..sinks.triplestore import _delta_dirs, lookup, write_triple_store

    store = f"/tmp/quickner_ray_tstore_clr_{_corpus_cache_key(sf_dir, 'v1')}"
    need = [
        p for p in ("spo", "pos")
        if not os.path.exists(os.path.join(store, p, "_DONE"))
    ]
    if need:
        write_triple_store(q_triples(sf_dir), store, perms=need)
    # guard on BOTH deltas existing: a crash between CLEAR and INSERT
    # re-runs safely (CLEAR of the already-cleared store is a no-op that
    # writes no delta, then the INSERT lands as the missing generation)
    if len(_delta_dirs(os.path.join(store, "pos"))) < 2:
        sparql_update(store, "CLEAR ALL", perms=["spo", "pos"])
        sparql_update(
            store,
            'INSERT DATA { "clr:d1" :AFTER "kept1" .\n'
            '              "clr:d1" :AFTER "kept2" .\n'
            '              "clr:d2" :AFTER "kept1" }',
            perms=["spo", "pos"],
        )
    return lookup(store, "pred", "AFTER").union(
        lookup(store, "pred", "OPERATOR")  # must be empty post-CLEAR
    )


def sql_kg_sparql_clear() -> str:
    return (
        "SELECT * FROM (VALUES\n"
        "  ('clr:d1', 'AFTER', 'kept1', CAST(1 AS BIGINT)),\n"
        "  ('clr:d1', 'AFTER', 'kept2', CAST(1 AS BIGINT)),\n"
        "  ('clr:d2', 'AFTER', 'kept1', CAST(1 AS BIGINT)))\n"
        "  t(subj, pred, obj, n_mentions)"
    )


def q_turtle_ingest(sf_dir: str):
    """Turtle RDF ingest (sources/turtle.py): parse the prefixed .ttl
    shard fixture (one parse task per shard file) and aggregate link
    counts per target host IRI — (obj, n_links). Per-batch partials
    bound the groupby to hosts/batch."""
    from ray.data.aggregate import Count

    from ..sources.turtle import read_turtle

    ds = read_turtle(_ttl_shards(sf_dir))

    def links(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(b.column("pred"), pa.scalar("http://ex.org/links_to"))
        ).select(["obj"])

    return (
        ds.map_batches(links, batch_format="pyarrow")
        .groupby("obj")
        .aggregate(Count(alias_name="n_links"))
    )


def sql_turtle_ingest() -> str:
    return (
        f"SELECT 'urn:q:host' || CAST(doc_id % {LINK_HOST_BUCKETS} AS VARCHAR)\n"
        f"    AS obj,\n"
        f"  count(*) AS n_links\n"
        f"FROM documents GROUP BY 1"
    )


# ---- named-graph quad store (sinks/quadstore.py + serving.quad_update) ------

def _quad_store(sf_dir: str, tag: str) -> str:
    """Build (or reuse) the per-graph quad store for the corpus's
    provenance quads (graph = document source). Fingerprint-keyed like
    every /tmp cache; write_quad_store skips finished per-graph
    permutations on re-run (resumable)."""
    from ..sinks.quadstore import list_graphs, write_quad_store

    store = f"/tmp/quickner_ray_qstore_{tag}_{_corpus_cache_key(sf_dir, 'v1')}"
    if not list_graphs(store):
        write_quad_store(quads_dataset(sf_dir), store, stats=True)
    return store


def _quad_store_r5(sf_dir: str) -> str:
    """ONE shared quad store for the round-5 graph-verb family: both
    contract queries' mutations touch DISJOINT graphs (the WITH-scoped
    rename lands only in src3's LSM roster; CLEAR GRAPH + reinsert only
    in src2's), so the post-mutation state is deterministic regardless
    of which query runs first — each ensures BOTH mutations before
    reading. Halves the 20-graph store build vs per-query stores (the
    build, 3 sorts x 20 graphs, dominates both bench rows). Guards are
    per-graph delta rosters, crash-safe like kg_sparql_clear.

    The store seeds as a HARDLINK clone of the pristine 'srv' store
    (shared with kg_quadstore_served): per-graph LSM runs are
    append-only — mutations only ADD delta dirs in the clone, base
    parquet files are never rewritten in place — so cloning by link is
    free and safe, and the 20-graph build runs ONCE for the whole
    round-5 family (crash-safe temp-dir + atomic rename)."""
    import shutil

    from ..serving import quad_update
    from ..sinks.quadstore import _delta_dirs, graph_dir, list_graphs

    pristine = _quad_store(sf_dir, "srv")
    store = (
        f"/tmp/quickner_ray_qstore_r5_{_corpus_cache_key(sf_dir, 'v1')}"
    )
    if not list_graphs(store):
        tmp = store + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(pristine, tmp, copy_function=os.link)
        shutil.rmtree(store, ignore_errors=True)
        os.rename(tmp, store)
    if not _delta_dirs(os.path.join(graph_dir(store, "src3"), "spo")):
        quad_update(
            store,
            "WITH :src3 DELETE { ?d :OPERATOR ?o . } "
            "INSERT { ?d :OP_RENAMED ?o . } WHERE { ?d :OPERATOR ?o . }",
        )
    if len(_delta_dirs(os.path.join(graph_dir(store, "src2"), "spo"))) < 2:
        quad_update(store, "CLEAR GRAPH :src2")
        quad_update(
            store,
            'INSERT DATA { GRAPH :src2 { "qclr:d1" :AFTER "kept" .\n'
            '                            "qclr:d2" :AFTER "kept" } }',
        )
    return store


def q_kg_quadstore_scoped_update(sf_dir: str):
    """GRAPH-SCOPED pattern-template UPDATE on the named-graph store
    (serving.quad_update): ``WITH :src3 DELETE { ?d :OPERATOR ?o } INSERT
    { ?d :OP_RENAMED ?o } WHERE { ?d :OPERATOR ?o }`` renames the
    predicate INSIDE ONE provenance graph — the delta lands in src3's
    per-graph LSM roster alone (|graph| work, the locality the
    graph-partitioned store buys; sinks/quadstore.py). The result counts
    distinct triples per (graph, pred) for both predicates across ALL
    graphs via ONE union-default lookup pair: src3 must answer only
    OP_RENAMED, every sibling graph only OPERATOR (src2 excepted — the
    sibling query's CLEAR GRAPH removed it; see _quad_store_r5), with
    identical counts to the pre-update corpus (rename moves keys, never
    loses them). Applied once per cached store (delta-roster guard)."""
    from ray.data.aggregate import Count

    from ..sinks.quadstore import quad_lookup

    store = _quad_store_r5(sf_dir)
    both = quad_lookup(store, "pred", "OPERATOR").union(
        quad_lookup(store, "pred", "OP_RENAMED")
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"g": b.column("graph"), "pred": b.column("pred")})

    return (
        both.map_batches(project, batch_format="pyarrow")
        .groupby(["g", "pred"])
        .aggregate(Count(alias_name="n_triples"))
    )


def sql_kg_quadstore_scoped_update() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "base AS (SELECT d.source AS g, CAST(a.doc_id AS VARCHAR) AS doc,\n"
        "         a.eid AS op\n"
        "         FROM acc a JOIN documents d ON a.doc_id = d.doc_id\n"
        "         WHERE a.plabel = 'OPERATOR'\n"
        "           AND d.source <> 'src2'  -- sibling query CLEARed src2\n"
        "         GROUP BY 1, 2, 3)\n"
        "SELECT g,\n"
        "  (CASE WHEN g = 'src3' THEN 'OP_RENAMED' ELSE 'OPERATOR' END)\n"
        "    AS pred,\n"
        "  CAST(count(*) AS BIGINT) AS n_triples\n"
        "FROM base GROUP BY 1, 2"
    )


def q_kg_quadstore_clear_graph(sf_dir: str):
    """``CLEAR GRAPH`` isolation on the named-graph store: clear ONE
    provenance graph (src2) — one delta generation negating only that
    graph's net support — then repopulate it with an INSERT DATA GRAPH
    block. Result: distinct-SYSTEM-triple counts per surviving graph
    (src2 must be absent — every key folded to zero through the
    delta-aware read) plus src2's re-inserted :AFTER rows; every sibling
    graph's counts must equal the pre-clear corpus (the sibling query's
    src3 rename touches only OPERATOR — SYSTEM is invariant to it).
    Shares the round-5 quad store (_quad_store_r5: disjoint-graph
    mutations, order-independent); crash-safe guard on BOTH src2 delta
    generations, mirroring kg_sparql_clear."""
    from ray.data.aggregate import Count

    from ..sinks.quadstore import quad_lookup

    store = _quad_store_r5(sf_dir)
    both = quad_lookup(store, "pred", "SYSTEM").union(
        quad_lookup(store, "pred", "AFTER")
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"g": b.column("graph"), "pred": b.column("pred")})

    return (
        both.map_batches(project, batch_format="pyarrow")
        .groupby(["g", "pred"])
        .aggregate(Count(alias_name="n_triples"))
    )


def sql_kg_quadstore_clear_graph() -> str:
    from .ner_oracle import sql_match_ctes

    return (
        f"WITH {sql_match_ctes(DEFAULT_GAZETTEER)},\n"
        "base AS (SELECT d.source AS g, CAST(a.doc_id AS VARCHAR) AS doc,\n"
        "         a.eid AS s\n"
        "         FROM acc a JOIN documents d ON a.doc_id = d.doc_id\n"
        "         WHERE a.plabel = 'SYSTEM' AND d.source <> 'src2'\n"
        "         GROUP BY 1, 2, 3)\n"
        "SELECT g, 'SYSTEM' AS pred, CAST(count(*) AS BIGINT) AS n_triples\n"
        "FROM base GROUP BY 1\n"
        "UNION ALL\n"
        "SELECT 'src2' AS g, 'AFTER' AS pred, CAST(2 AS BIGINT) AS n_triples"
    )


def q_kg_sparql_path_closure(sf_dir: str):
    """UNBOUNDED SPARQL 1.1 property-path closure, written in query text:
    ``?a :LINKS+ ?b`` over the (cyclic) web host graph — the bare ``+``
    compiles to the TO-FIXPOINT Kleene closure (stages/paths
    min_hops_closure max_hops=None): semi-naive frontier rounds that stop
    the round the anti-joined frontier empties (graph-diameter rounds,
    |V|^2-bounded pair state, never path enumerations). The oracle is a
    recursive CTE with UNION — DuckDB's set-semantics recursion reaches
    the same fixpoint on cycles. Same deterministic sparse link subgraph
    as host_reachability (doc_id % 23 == 0)."""
    from ..kernel.sparql import run_select
    from ..stages.linkgraph import host_link_graph

    edges = host_link_graph(_linked_pages(sf_dir, mod=PATH_DOC_MOD))
    tri = edges.map_batches(
        lambda b: pa.table(
            {
                "subj": b.column("src_host"),
                "pred": pa.array(["LINKS"] * b.num_rows, type=pa.string()),
                "obj": b.column("dst_host"),
            }
        ),
        batch_format="pyarrow",
    )
    return run_select(tri, "SELECT ?a ?b WHERE { ?a :LINKS+ ?b . }")


def sql_kg_sparql_path_closure() -> str:
    return (
        f"WITH RECURSIVE l AS (\n"
        f"  SELECT (doc_id % {LINK_HOST_BUCKETS}) AS sb,\n"
        f"         ((doc_id*7 + 13*j + 3) % {LINK_HOST_BUCKETS}) AS db\n"
        f"  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j) t\n"
        f"  WHERE doc_id % {PATH_DOC_MOD} = 0),\n"
        f"e AS (\n"
        f"  SELECT DISTINCT\n"
        f"    'host' || CAST(sb AS VARCHAR) || '.example.com' AS src,\n"
        f"    'host' || CAST(db AS VARCHAR) || '.example.com' AS dst\n"
        f"  FROM l WHERE sb <> db),\n"
        f"r AS (\n"
        f"  SELECT src, dst FROM e\n"
        f"  UNION\n"  # set semantics: the recursion reaches fixpoint on cycles
        f"  SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src)\n"
        f"SELECT DISTINCT src AS a, dst AS b FROM r"
    )


def q_kg_quadstore_served(sf_dir: str):
    """The kg_graph_bgp query TEXT answered FROM the named-graph store
    (serving.quad_select serve="lookup"): the bound-predicate pattern
    inside ``GRAPH ?g`` reads the per-graph POS permutation subtrees as
    ONE pruned file-list read (graph column in-file binds ?g), never the
    extraction stream — the deployed-endpoint shape for provenance
    graphs. Same oracle as kg_graph_bgp: answer-identical to the
    in-flight quad-stream evaluation."""
    from ..serving import quad_select

    store = _quad_store(sf_dir, "srv")
    return quad_select(
        store,
        "SELECT ?g (COUNT(DISTINCT ?d) AS ?n_docs) WHERE { "
        "GRAPH ?g { ?d :SYSTEM ?s . } } GROUP BY ?g",
    )
