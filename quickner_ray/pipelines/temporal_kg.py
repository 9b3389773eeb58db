"""Temporal-KG queries over versioned infobox facts.

The fact source extends ``queries._infobox_pages``'s deterministic scheme
with a time axis: every document is re-crawled at SNAPSHOTS snapshot
points, and each (doc, attr) fact advances one EPOCH every
``period = 2 + doc_id % 3`` snapshots — so fact values genuinely change
over time at per-document cadence, and the SQL oracle regenerates the
exact observation table arithmetically while the Ray path must recover
it from raw page bytes (same adversarial markup as the static infobox
queries: comment decoys, <b> wraps, entity escapes).

value_j(doc, epoch) = 'v' || (doc*(j+2) + 5*j + 1 + 31*epoch) % 97 || ' & co'

31 is coprime to 97, so every epoch within the snapshot horizon yields a
DISTINCT value string — island boundaries equal epoch boundaries exactly
and the interval collapse is non-trivial (change detection, not distinct).

Three operators (stages/temporal.py):
- fact_validity_intervals — SCD2 collapse to [valid_from, valid_to]
- fact_asof_lookup       — multi-key as-of join of probe timestamps
- fact_majority_vote     — truth discovery across staleness-lagged sources
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import INFOBOX_ATTRS, INFOBOX_MOD, _docs

SNAPSHOTS = 6
EPOCH_STEP = 31  # coprime to INFOBOX_MOD=97: epochs never collide
OBS_TS_SCALE = 10  # snapshot t observed at ts = 10*(t+1): probes < 10 miss
PROBES_PER_DOC = 4  # probe_ts = doc_id % 7 + 13*i
K_SOURCES = 5  # assertions per fact for majority vote
SRC_MOD = 13

_ATTRS_SQL = ", ".join(f"'{a}'" for a in INFOBOX_ATTRS)


def _value(d: int, j: int, epoch: int) -> str:
    return f"v{(d * (j + 2) + 5 * j + 1 + EPOCH_STEP * epoch) % INFOBOX_MOD} & co"


def _period(d: int) -> int:
    return 2 + d % 3


def _snapshot_pages(sf_dir: str):
    """(doc_id, snap, html): SNAPSHOTS re-crawls per doc, fact values at
    the doc's epoch for that snapshot."""
    from ..kernel.htmlextract import synth_infobox_page

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").combine_chunks().to_pylist()
        out_ids, out_snaps, htmls = [], [], []
        for d in ids:
            p = _period(d)
            for t in range(SNAPSHOTS):
                e = t // p
                facts = [(a, _value(d, j, e)) for j, a in enumerate(INFOBOX_ATTRS)]
                out_ids.append(d)
                out_snaps.append(t)
                htmls.append(
                    synth_infobox_page(f"doc {d} snap {t}", facts, seq=d * SNAPSHOTS + t)
                )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "snap": pa.array(out_snaps, type=pa.int64()),
                "html": pa.array(htmls, type=pa.binary()),
            }
        )

    return _docs(sf_dir, columns=["doc_id"]).map_batches(build, batch_format="pyarrow")


def _assertion_pages(sf_dir: str):
    """(doc_id, source, html): K_SOURCES independent assertions per doc at
    the FINAL snapshot; odd-k sources of odd docs (and source 4 of
    doc_id%4==3 docs) are one epoch STALE — so doc_id%4 in (0,2) is
    conflict-free, %4==1 has a fresh 3-2 majority, %4==3 a stale 3-2
    majority (tests the vote both ways)."""
    from ..kernel.htmlextract import synth_infobox_page

    e_final = lambda d: (SNAPSHOTS - 1) // _period(d)  # noqa: E731

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").combine_chunks().to_pylist()
        out_ids, sources, htmls = [], [], []
        for d in ids:
            ef = e_final(d)
            for k in range(K_SOURCES):
                lag = int((d % 2 == 1 and k % 2 == 1) or (d % 4 == 3 and k == 4))
                facts = [
                    (a, _value(d, j, ef - lag)) for j, a in enumerate(INFOBOX_ATTRS)
                ]
                out_ids.append(d)
                sources.append(f"src{(d + 7 * k) % SRC_MOD}")
                htmls.append(synth_infobox_page(f"doc {d} src {k}", facts, seq=d + k))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "source": pa.array(sources, type=pa.string()),
                "html": pa.array(htmls, type=pa.binary()),
            }
        )

    return _docs(sf_dir, columns=["doc_id"]).map_batches(build, batch_format="pyarrow")


def _snapshot_facts(sf_dir: str):
    from ..stages.relations import infobox_facts

    return infobox_facts(_snapshot_pages(sf_dir), carry_cols=["snap"])


def _snapshot_facts_cached(sf_dir: str):
    """Write-once snapshot-fact table shared by the five temporal-KG
    consumers (intervals, churn, as-of, snapshot BGP): extract ONCE ->
    partitioned parquet under /tmp -> each consumer re-reads streaming.
    Crash-safe temp-dir + atomic-rename promotion; keyed on the source
    corpus fingerprint so regenerated testdata can never serve a stale
    cache (same pattern as queries.annotated_documents_cached)."""
    import shutil

    import ray.data as rd

    from .queries import _corpus_cache_key

    d = f"/tmp/quickner_ray_snapfacts_{_corpus_cache_key(sf_dir, 'tkg-v1')}"
    done = d + ".done"
    if not os.path.exists(done):
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        _snapshot_facts(sf_dir).write_parquet(tmp)
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        with open(done, "w") as f:
            f.write("ok\n")
    return rd.read_parquet(d)


_SQL_OBS = (
    "obs AS (\n"
    f"  SELECT doc_id, s.snap AS snap, [{_ATTRS_SQL}][t.j + 1] AS attr,\n"
    f"         'v' || CAST((doc_id*(t.j+2) + 5*t.j + 1 + {EPOCH_STEP}*"
    f"(s.snap // (2 + doc_id % 3))) % {INFOBOX_MOD} AS VARCHAR)"
    " || ' & co' AS value\n"
    "  FROM documents\n"
    "  CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) t\n"
    f"  CROSS JOIN (SELECT unnest(range({SNAPSHOTS})) AS snap) s)"
)


def q_fact_validity_intervals(sf_dir: str):
    """Temporal KG SCD2: collapse per-(subject, attr) fact observations
    over crawl snapshots into validity intervals (islands). One bucket
    shuffle; vectorized multi-key island kernel per bucket
    (stages/temporal.islands_by_key)."""
    from ..stages.temporal import islands_by_key

    return islands_by_key(
        _snapshot_facts_cached(sf_dir),
        key_cols=["doc_id", "attr"],
        order_col="snap",
        value_col="value",
    )


def sql_fact_validity_intervals() -> str:
    return (
        f"WITH {_SQL_OBS},\n"
        "chg AS (SELECT doc_id, attr, snap, value,\n"
        "  CASE WHEN lag(value) OVER (PARTITION BY doc_id, attr ORDER BY snap)\n"
        "       IS DISTINCT FROM value THEN 1 ELSE 0 END AS c FROM obs),\n"
        "isl AS (SELECT *, sum(c) OVER (PARTITION BY doc_id, attr ORDER BY snap)"
        " AS island FROM chg)\n"
        "SELECT doc_id, attr, max(value) AS value,\n"
        "       CAST(min(snap) AS BIGINT) AS valid_from,\n"
        "       CAST(max(snap) AS BIGINT) AS valid_to,\n"
        "       CAST(count(*) AS BIGINT) AS n_snaps\n"
        "FROM isl GROUP BY doc_id, attr, island"
    )


def q_fact_churn_stats(sf_dir: str):
    """Temporal-KG churn rollup: per attribute, how volatile is the fact
    across the corpus — subjects observed, total validity islands,
    subjects whose value changed at least once, and the max island count.
    Shape: per-(subject, attr) island counts (one bucket shuffle,
    stages/temporal.island_counts) -> batch-local per-attr partials
    (attr set is bounded) -> one tiny groupby on attr."""
    from ray.data.aggregate import Max, Sum

    from ..stages.temporal import island_counts

    per_key = island_counts(
        _snapshot_facts_cached(sf_dir),
        key_cols=["doc_id", "attr"],
        order_col="snap",
        value_col="value",
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "attr": pa.array([], type=pa.string()),
                    "n_subjects": pa.array([], type=pa.int64()),
                    "n_islands": pa.array([], type=pa.int64()),
                    "n_changed_subjects": pa.array([], type=pa.int64()),
                    "max_islands": pa.array([], type=pa.int64()),
                }
            )
        t = b.sort_by([("attr", "ascending")])
        attr = t.column("attr")
        if isinstance(attr, pa.ChunkedArray):
            attr = attr.combine_chunks()
        ni = t.column("n_islands")
        if isinstance(ni, pa.ChunkedArray):
            ni = ni.combine_chunks()
        ni = ni.to_numpy(zero_copy_only=False)
        a_np = np.asarray(attr.to_pylist(), dtype=object)
        new = np.r_[True, a_np[1:] != a_np[:-1]]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "attr": attr.take(pa.array(starts)),
                "n_subjects": pa.array(
                    (np.r_[starts[1:], len(a_np)] - starts).astype(np.int64)
                ),
                "n_islands": pa.array(np.add.reduceat(ni, starts)),
                "n_changed_subjects": pa.array(
                    np.add.reduceat((ni > 1).astype(np.int64), starts)
                ),
                "max_islands": pa.array(np.maximum.reduceat(ni, starts)),
            }
        )

    agg = (
        per_key.map_batches(partial, batch_format="pyarrow")
        .groupby("attr")
        .aggregate(
            Sum("n_subjects", alias_name="n_subjects"),
            Sum("n_islands", alias_name="n_islands"),
            Sum("n_changed_subjects", alias_name="n_changed_subjects"),
            Max("max_islands", alias_name="max_islands"),
        )
    )
    return agg


def sql_fact_churn_stats() -> str:
    return (
        f"WITH {_SQL_OBS},\n"
        "chg AS (SELECT doc_id, attr, snap, value,\n"
        "  CASE WHEN lag(value) OVER (PARTITION BY doc_id, attr ORDER BY snap)\n"
        "       IS DISTINCT FROM value THEN 1 ELSE 0 END AS c FROM obs),\n"
        "pk AS (SELECT doc_id, attr, CAST(sum(c) AS BIGINT) AS n_islands\n"
        "       FROM chg GROUP BY doc_id, attr)\n"
        "SELECT attr, CAST(count(*) AS BIGINT) AS n_subjects,\n"
        "       CAST(sum(n_islands) AS BIGINT) AS n_islands,\n"
        "       CAST(sum(CASE WHEN n_islands > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_changed_subjects,\n"
        "       CAST(max(n_islands) AS BIGINT) AS max_islands\n"
        "FROM pk GROUP BY attr"
    )


def q_fact_asof_lookup(sf_dir: str):
    """Multi-key as-of join: probe timestamps (4 per doc x 3 attrs) pick
    the fact version valid at that instant — the 'what did the KG believe
    at time T' primitive. Probes below the first observation ts stay null
    (left as-of). One bucket shuffle (stages/temporal.asof_join)."""
    from ..stages.temporal import asof_join

    def to_obs(b: pa.Table) -> pa.Table:
        snap = b.column("snap")
        if isinstance(snap, pa.ChunkedArray):
            snap = snap.combine_chunks()
        obs_ts = pc.add(
            pc.multiply(snap, pa.scalar(OBS_TS_SCALE, type=pa.int64())),
            pa.scalar(OBS_TS_SCALE, type=pa.int64()),
        )
        return b.drop_columns(["snap"]).append_column("obs_ts", obs_ts)

    obs = _snapshot_facts_cached(sf_dir).map_batches(to_obs, batch_format="pyarrow")

    def probes(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ids)
        d = np.repeat(ids, PROBES_PER_DOC * len(INFOBOX_ATTRS))
        i = np.tile(np.repeat(np.arange(PROBES_PER_DOC), len(INFOBOX_ATTRS)), n)
        j = np.tile(np.arange(len(INFOBOX_ATTRS)), n * PROBES_PER_DOC)
        return pa.table(
            {
                "doc_id": pa.array(d, type=pa.int64()),
                "attr": pa.array(np.array(INFOBOX_ATTRS, dtype=object)[j]),
                "probe_ts": pa.array((d % 7 + 13 * i).astype(np.int64)),
            }
        )

    probe_ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        probes, batch_format="pyarrow"
    )
    return asof_join(
        probe_ds,
        obs,
        key_cols=["doc_id", "attr"],
        left_ts="probe_ts",
        right_ts="obs_ts",
        value_cols=["value", "obs_ts"],
        carry_cols=[],
    )


def sql_fact_asof_lookup() -> str:
    return (
        f"WITH {_SQL_OBS},\n"
        "o AS (SELECT doc_id, attr, value,\n"
        f"      CAST({OBS_TS_SCALE}*(snap + 1) AS BIGINT) AS obs_ts FROM obs),\n"
        f"p AS (SELECT doc_id, [{_ATTRS_SQL}][t.j + 1] AS attr,\n"
        "      CAST(doc_id % 7 + 13*u.i AS BIGINT) AS probe_ts\n"
        "  FROM documents\n"
        "  CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) t\n"
        f"  CROSS JOIN (SELECT unnest(range({PROBES_PER_DOC})) AS i) u)\n"
        "SELECT p.doc_id, p.attr, p.probe_ts, o.value, o.obs_ts\n"
        "FROM p ASOF LEFT JOIN o\n"
        "  ON p.doc_id = o.doc_id AND p.attr = o.attr AND o.obs_ts <= p.probe_ts"
    )


SNAPSHOT_BGP_T = 3
SNAPSHOT_BGP_LANG = "v42 & co"  # language value with multiple holders at T


def q_kg_snapshot_bgp(sf_dir: str):
    """Temporal BGP — the two new subsystems composed: facts valid AT
    snapshot T (SCD2 islands filtered on valid_from <= T <= valid_to)
    form a (doc, attr, value) triple view, and a SPARQL-style BGP runs
    over it: docs whose 'language' fact at T equals a constant, binding
    their 'population' and 'area' values at the same instant. The SQL
    oracle derives the same answer from the RAW observation table at
    snap = T — an independent formulation, so interval reconstruction is
    cross-checked, not mirrored."""
    from ..stages.bgp import bgp_match
    from ..stages.temporal import islands_by_key

    iv = islands_by_key(
        _snapshot_facts_cached(sf_dir),
        key_cols=["doc_id", "attr"],
        order_col="snap",
        value_col="value",
    )

    def at_t(b: pa.Table) -> pa.Table:
        lo = b.column("valid_from")
        hi = b.column("valid_to")
        t = pa.scalar(SNAPSHOT_BGP_T, type=pa.int64())
        keep = pc.and_(pc.less_equal(lo, t), pc.greater_equal(hi, t))
        f = b.filter(keep)
        ids = f.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "subj": pc.cast(ids, pa.string()),
                "pred": f.column("attr"),
                "obj": f.column("value"),
            }
        )

    return bgp_match(
        iv.map_batches(at_t, batch_format="pyarrow"),
        [
            ("?doc", "language", SNAPSHOT_BGP_LANG),
            ("?doc", "population", "?pop"),
            ("?doc", "area", "?area"),
        ],
    )


def sql_kg_snapshot_bgp() -> str:
    return (
        f"WITH {_SQL_OBS},\n"
        f"att AS (SELECT doc_id, attr, value FROM obs WHERE snap = {SNAPSHOT_BGP_T})\n"
        "SELECT DISTINCT CAST(a.doc_id AS VARCHAR) AS doc,\n"
        "       b.value AS pop, c.value AS area\n"
        "FROM att a JOIN att b ON a.doc_id = b.doc_id\n"
        "     JOIN att c ON a.doc_id = c.doc_id\n"
        f"WHERE a.attr = 'language' AND a.value = '{SNAPSHOT_BGP_LANG}'\n"
        "  AND b.attr = 'population' AND c.attr = 'area'"
    )


def q_fact_majority_vote(sf_dir: str):
    """Truth discovery: K_SOURCES sources assert each (doc, attr) fact —
    some one epoch stale — and the value with the most distinct sources
    wins (ties to the smallest value). Batch-local distinct combiner, one
    bucket shuffle (stages/temporal.majority_vote)."""
    from ..stages.relations import infobox_facts
    from ..stages.temporal import majority_vote

    facts = infobox_facts(_assertion_pages(sf_dir), carry_cols=["source"])
    return majority_vote(
        facts, key_cols=["doc_id", "attr"], value_col="value", source_col="source"
    )


def sql_fact_majority_vote() -> str:
    e_final = f"(({SNAPSHOTS - 1}) // (2 + doc_id % 3))"
    lag = (
        "CASE WHEN (doc_id % 2 = 1 AND u.k % 2 = 1)"
        " OR (doc_id % 4 = 3 AND u.k = 4) THEN 1 ELSE 0 END"
    )
    return (
        "WITH a AS (\n"
        f"  SELECT doc_id, [{_ATTRS_SQL}][t.j + 1] AS attr,\n"
        f"    'src' || CAST((doc_id + 7*u.k) % {SRC_MOD} AS VARCHAR) AS source,\n"
        f"    'v' || CAST((doc_id*(t.j+2) + 5*t.j + 1 + {EPOCH_STEP}*"
        f"({e_final} - {lag})) % {INFOBOX_MOD} AS VARCHAR) || ' & co' AS value\n"
        "  FROM documents\n"
        "  CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) t\n"
        f"  CROSS JOIN (SELECT unnest(range({K_SOURCES})) AS k) u),\n"
        "kv AS (SELECT doc_id, attr, value,\n"
        "       CAST(count(DISTINCT source) AS BIGINT) AS sup\n"
        "       FROM a GROUP BY 1, 2, 3),\n"
        "ky AS (SELECT doc_id, attr,\n"
        "       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,\n"
        "       CAST(count(DISTINCT value) AS BIGINT) AS n_values\n"
        "       FROM a GROUP BY 1, 2),\n"
        "w AS (SELECT doc_id, attr, value, sup, row_number() OVER\n"
        "      (PARTITION BY doc_id, attr ORDER BY sup DESC, value ASC) AS rn\n"
        "      FROM kv)\n"
        "SELECT ky.doc_id, ky.attr, ky.n_sources, ky.n_values,\n"
        "       w.value AS majority_value, w.sup AS support,\n"
        "       CAST(ky.n_values > 1 AS BIGINT) AS conflict\n"
        "FROM ky JOIN w ON w.doc_id = ky.doc_id AND w.attr = ky.attr AND w.rn = 1"
    )
