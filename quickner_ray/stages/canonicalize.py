"""Mention explosion, canonicalization, and triple materialization.

This generalizes the reference's entity index (A2, quickner.rs:730-742 —
lowercased-surface -> doc ids) into the KG-construction shuffle demanded by
the north rule:

- ``explode_mentions``: annotated docs -> one row per mention, vectorized
  via ``pc.list_flatten``/``list_parent_indices`` (no Python row loop over
  docs; surfaces are sliced only for actual mentions).
- ``canonical_entities``: the canonicalization "shuffle" done as
  partial-then-final aggregation: each batch pre-aggregates counts per
  (surface_norm, label) — bounding skew because a batch contributes at most
  ONE row per key no matter how hot the surface is (the salting/combiner
  strategy of SURVEY.md §4) — then a small ``groupby().sum()`` merges
  partials. Canonical entity id = md5("surface_norm\\x00label").
- ``add_triple_columns``: mentions -> (subj, pred, obj) triples WITHOUT any
  shuffle: obj is the deterministic canonical id, computed per batch.
- ``label_counts``: A5 per-label totals, same partial-aggregate shape.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def _as_combined(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def entity_id(surface_norm: str, label: str) -> str:
    return hashlib.md5(
        surface_norm.encode("utf-8") + b"\x00" + label.encode("utf-8")
    ).hexdigest()


def _slice_surfaces(text_arr: pa.Array, parents, starts, ends) -> pa.Array:
    """Per-mention ``text[start:end]`` slices, vectorized.

    ASCII fast path: char == byte indices, so the slices are a single numpy
    gather over the Arrow data buffer (no per-mention Python). Non-ASCII
    falls back to Python char slicing (char-index semantics, SURVEY §1.2).
    """
    import numpy as np

    n = len(text_arr)
    ascii_ok = n == 0 or pc.all(
        pc.equal(pc.utf8_length(text_arr), pc.binary_length(text_arr))
    ).as_py()
    if not ascii_ok:
        def _aslist(x):
            return x.to_pylist() if hasattr(x, "to_pylist") else list(x)

        texts = text_arr.to_pylist()
        return pa.array(
            [
                texts[pi][si:ei]
                for pi, si, ei in zip(_aslist(parents), _aslist(starts), _aslist(ends))
            ],
            type=pa.large_string(),
        )
    off_dtype = np.int64 if pa.types.is_large_string(text_arr.type) else np.int32
    offsets = np.frombuffer(
        text_arr.buffers()[1], dtype=off_dtype, count=n + 1 + text_arr.offset
    )[text_arr.offset :]
    data = np.frombuffer(text_arr.buffers()[2], dtype=np.uint8)
    pn = np.asarray(parents, dtype=np.int64)
    sn = np.asarray(starts, dtype=np.int64)
    en = np.asarray(ends, dtype=np.int64)
    abs_s = offsets[pn].astype(np.int64) + sn
    lens = en - sn
    new_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=new_off[1:])
    total = int(new_off[-1])
    idx = np.repeat(abs_s - new_off[:-1], lens) + np.arange(total, dtype=np.int64)
    out_data = data[idx] if total else np.empty(0, dtype=np.uint8)
    return pa.Array.from_buffers(
        pa.large_string(),
        len(lens),
        [None, pa.py_buffer(new_off.tobytes()), pa.py_buffer(out_data.tobytes())],
    )


def explode_mentions(
    batch: pa.Table, *, subj_col: str = "doc_id", keep_text: bool = False
) -> pa.Table:
    """Annotated-docs batch -> mentions batch
    (subj, doc_id?, label, start, end, surface, surface_norm).

    ``keep_text=True`` adds a ``doc_text`` column (the matched-on text taken
    per mention) for stages that need mention context, e.g. entity linking —
    Arrow ``take`` references the same string buffer, no per-mention copy."""
    labels = batch.column("label")
    if isinstance(labels, pa.ChunkedArray):
        labels = labels.combine_chunks()
    flat = pc.list_flatten(labels)
    parents = pc.list_parent_indices(labels)
    starts = flat.field("start")
    ends = flat.field("end")
    lbls = flat.field("label")
    text_arr = batch.column("text")
    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()
    surface_arr = _slice_surfaces(text_arr, parents, starts, ends)
    # A2 lowercases the surface when indexing (quickner.rs:737)
    surface_norm = pc.utf8_lower(surface_arr)
    cols = {}
    for name in (subj_col, "doc_id", "url", "lang"):
        if name in batch.column_names and name not in cols:
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(parents)
    cols["label"] = lbls
    cols["start"] = starts
    cols["end"] = ends
    cols["surface"] = surface_arr
    cols["surface_norm"] = surface_norm
    if keep_text:
        # dictionary-encoded: each doc's text stored ONCE per batch, mentions
        # hold int indices (a plain take would copy the text per mention)
        cols["doc_text"] = pa.DictionaryArray.from_arrays(
            parents.cast(pa.int32()), text_arr
        )
    return pa.Table.from_pydict(cols)


def partial_entity_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: at most one row per (surface_norm, label).
    Accepts mention rows (``label``) or triple rows (``pred``)."""
    label_col = "label" if "label" in batch.column_names else "pred"
    out = batch.group_by(["surface_norm", label_col]).aggregate(
        [("surface_norm", "count")]
    )
    return out.rename_columns(["surface_norm", "label", "partial_count"])


def canonical_entities(mentions_ds):
    """Mentions (or triples) Dataset -> canonical entity table
    (entity_id, surface_norm, label, n_mentions)."""
    from ray.data.aggregate import Sum

    partials = mentions_ds.map_batches(partial_entity_counts, batch_format="pyarrow")
    merged = partials.groupby(["surface_norm", "label"]).aggregate(
        Sum("partial_count", alias_name="n_mentions")
    )

    def _with_id(batch: pa.Table) -> pa.Table:
        ids = [
            entity_id(s, l)
            for s, l in zip(
                batch.column("surface_norm").to_pylist(),
                batch.column("label").to_pylist(),
            )
        ]
        return batch.append_column("entity_id", pa.array(ids, type=pa.string()))

    return merged.map_batches(_with_id, batch_format="pyarrow")


def add_triple_columns(batch: pa.Table, *, subj_col: str = "url") -> pa.Table:
    """Mentions batch -> triples batch. No shuffle: obj is content-derived.

    subj = the document (url if present else doc_id), pred = label,
    obj = canonical entity id; surface/start/end retained as evidence.
    Surfaces are Zipf-repetitive, so the md5 entity id is computed once per
    DISTINCT (surface_norm, label) via dictionary encoding, not per mention.
    """
    if subj_col not in batch.column_names:
        subj_col = "doc_id"
    sn = batch.column("surface_norm")
    lbl = batch.column("label")
    if isinstance(sn, pa.ChunkedArray):
        sn = sn.combine_chunks()
    if isinstance(lbl, pa.ChunkedArray):
        lbl = lbl.combine_chunks()
    # join kernel requires uniform string types across operands
    key = pc.binary_join_element_wise(
        sn.cast(pa.large_string()),
        lbl.cast(pa.large_string()),
        pa.scalar("\x00", type=pa.large_string()),
    )
    dict_arr = pc.dictionary_encode(key)
    uniq_ids = pa.array(
        [
            hashlib.md5(k.encode("utf-8")).hexdigest()
            for k in dict_arr.dictionary.to_pylist()
        ],
        type=pa.string(),
    )
    ids = uniq_ids.take(dict_arr.indices)
    out = pa.Table.from_pydict(
        {
            "subj": batch.column(subj_col).cast(pa.string()),
            "pred": lbl,
            "obj": ids,
            "surface_norm": sn,
            "start": batch.column("start"),
            "end": batch.column("end"),
        }
    )
    return out


def partial_label_counts(batch: pa.Table) -> pa.Table:
    return (
        batch.group_by(["label"])
        .aggregate([("label", "count")])
        .rename_columns(["label", "partial_count"])
    )


def label_counts(mentions_ds):
    """A5: label -> total mention count (partial-then-final aggregate)."""
    from ray.data.aggregate import Sum

    partials = mentions_ds.map_batches(partial_label_counts, batch_format="pyarrow")
    return partials.groupby("label").aggregate(Sum("partial_count", alias_name="n_mentions"))


def canonical_entities_from_pids(triples_ds, gazetteer):
    """Canonical entity table from the fused-path ``pid`` column: per-batch
    int32 count combiner -> tiny groupby -> names/labels/ids attached from
    the gazetteer driver-side. Reads ONE small integer column instead of two
    string columns (the 100TB-scale phase-C saver).

    With case_sensitive=True, case-variant names with the same label (e.g.
    'Apple'/'apple') are DISTINCT pids but the same canonical
    (surface_norm, label) entity — pids are folded to a representative pid
    inside the per-batch combiner (a small int->int take), so the shuffle
    key is already canonical and the output matches the standard path's
    groupby(surface_norm, label)."""
    import numpy as np
    from ray.data.aggregate import Sum

    norms = [n.lower() for n in gazetteer.names]
    labels = list(gazetteer.labels)
    eids = [entity_id(n, l) for n, l in zip(norms, labels)]
    rep_of: dict[tuple[str, str], int] = {}
    rep = np.empty(len(norms), dtype=np.int32)
    for pid, key in enumerate(zip(norms, labels)):
        rep[pid] = rep_of.setdefault(key, pid)
    identity_rep = bool((rep == np.arange(len(norms), dtype=np.int32)).all())

    def partial(batch: pa.Table) -> pa.Table:
        if not identity_rep:
            pids = _as_combined(batch.column("pid")).to_numpy(zero_copy_only=False)
            batch = batch.set_column(
                batch.column_names.index("pid"), "pid", pa.array(rep[pids])
            )
        out = batch.group_by(["pid"]).aggregate([("pid", "count")])
        return out.rename_columns(["pid", "partial_count"])

    merged = triples_ds.map_batches(partial, batch_format="pyarrow")
    merged = merged.groupby("pid").aggregate(Sum("partial_count", alias_name="n_mentions"))

    def attach(batch: pa.Table) -> pa.Table:
        pids = batch.column("pid").to_pylist()
        return pa.Table.from_pydict(
            {
                "surface_norm": pa.array([norms[p] for p in pids], type=pa.string()),
                "label": pa.array([labels[p] for p in pids], type=pa.string()),
                "n_mentions": batch.column("n_mentions"),
                "entity_id": pa.array([eids[p] for p in pids], type=pa.string()),
            }
        )

    return merged.map_batches(attach, batch_format="pyarrow")


def label_counts_from_entities(entities_ds):
    """A5 computed from the (tiny) canonical-entity table instead of a
    full-corpus pass: sum n_mentions per label."""
    from ray.data.aggregate import Sum

    return entities_ds.groupby("label").aggregate(
        Sum("n_mentions", alias_name="n_mentions")
    )


def entity_timeline(
    ann, *, n_snapshots: int = 8, doc_col: str = "doc_id", snap_col: str | None = None
):
    """Temporal-KG provenance: per canonical entity, the crawl-snapshot
    validity interval and support — (surface_norm, label, first_snap,
    last_snap, n_snaps, n_mentions, entity_id).

    A crawl corpus arrives as periodic snapshots (monthly CC dumps); a KG
    built from it needs to know WHEN each entity was observed (entity
    churn, stale-fact detection, triple validity ranges). Snapshot id here
    is the deterministic ``doc_id % n_snapshots`` bucket — the stand-in
    for ``date_trunc('month', warc_ts)`` on a table that carries no
    timestamp column; a real crawl passes its warc_ts bucket instead.

    ``snap_col``: a precomputed integer snapshot column on the annotated
    dataset (e.g. ``year*12 + month`` of the crawl's ``warc_ts``, the
    north-rule pages schema) — used instead of the doc_id-derived bucket
    when given; mentions inherit their document's snapshot via a
    batch-local index_in (the explode is doc-local by construction).

    Shape (the 100 TB-safe one): fused doc-local explode -> per-batch
    combiner emitting at most ONE row per (surface_norm, label, snap) per
    batch (bounded by |gazetteer| x n_snapshots regardless of batch size)
    -> groupby-sum on the 3-part key -> second groupby on the entity key
    folds the per-snapshot rows into (min, max, count, sum). Both shuffles
    move only combiner output, never mention rows.
    """
    import numpy as np
    from ray.data.aggregate import Count, Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "surface_norm": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.string()),
                "snap": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        m = explode_mentions(b, subj_col=doc_col)
        if m.num_rows == 0:
            return empty
        ids = _as_combined(m.column(doc_col)).cast(pa.int64())
        if snap_col is None:
            snap = pa.array(
                ids.to_numpy(zero_copy_only=False) % n_snapshots, type=pa.int64()
            )
        else:
            pos = pc.index_in(
                _as_combined(m.column(doc_col)), _as_combined(b.column(doc_col))
            )
            snap = _as_combined(b.column(snap_col)).cast(pa.int64()).take(pos)
        t = pa.table(
            {
                "surface_norm": m.column("surface_norm"),
                "label": m.column("label"),
                "snap": snap,
            }
        )
        g = t.group_by(["surface_norm", "label", "snap"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["surface_norm", "label", "snap", "n"])

    partials = ann.map_batches(partial, batch_format="pyarrow")
    per_snap = partials.groupby(["surface_norm", "label", "snap"]).aggregate(
        Sum("n", alias_name="n")
    )
    tl = per_snap.groupby(["surface_norm", "label"]).aggregate(
        Min("snap", alias_name="first_snap"),
        Max("snap", alias_name="last_snap"),
        Count(alias_name="n_snaps"),
        Sum("n", alias_name="n_mentions"),
    )

    def with_id(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "surface_norm": pa.array([], type=pa.string()),
                    "label": pa.array([], type=pa.string()),
                    "first_snap": pa.array([], type=pa.int64()),
                    "last_snap": pa.array([], type=pa.int64()),
                    "n_snaps": pa.array([], type=pa.int64()),
                    "n_mentions": pa.array([], type=pa.int64()),
                    "entity_id": pa.array([], type=pa.string()),
                }
            )
        ids = [
            entity_id(s, l)
            for s, l in zip(
                b.column("surface_norm").to_pylist(),
                b.column("label").to_pylist(),
            )
        ]
        return b.append_column("entity_id", pa.array(ids, type=pa.string()))

    return tl.map_batches(with_id, batch_format="pyarrow")


def fact_corroboration(
    ann,
    *,
    doc_col: str = "doc_id",
    source_col: str = "source",
    min_sources: int = 2,
):
    """Knowledge-fusion fact support (Knowledge-Vault-style multi-source
    corroboration): per canonical fact (surface_norm, label), the number
    of DISTINCT sources (hosts / crawl feeds) that assert it, total
    mention support, and a ``corroborated`` flag (``n_sources >=
    min_sources``). A KG built from web extraction trusts a fact far more
    when independent hosts repeat it than when one site repeats it many
    times — this is the fusion signal that separates the two.

    ``ann`` must carry ``source_col`` (the provenance string — host of the
    page URL, or the corpus ``source`` column); mentions inherit their
    document's source via a batch-local index_in (the explode is doc-local
    by construction).

    Shape (the 100 TB-safe one, same as ``entity_timeline``): fused
    doc-local explode -> per-batch combiner emitting at most ONE row per
    (surface_norm, label, source) per batch (bounded by |gazetteer| x
    |sources-in-batch| regardless of batch size) -> groupby-sum on the
    3-part key -> second groupby on the entity key folds per-source rows
    into (count -> n_sources, sum -> n_mentions). Both shuffles move only
    combiner output, never mention rows.
    """
    from ray.data.aggregate import Count, Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "surface_norm": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.string()),
                "src": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        m = explode_mentions(b, subj_col=doc_col)
        if m.num_rows == 0:
            return empty
        pos = pc.index_in(
            _as_combined(m.column(doc_col)), _as_combined(b.column(doc_col))
        )
        src = _as_combined(b.column(source_col)).cast(pa.string()).take(pos)
        t = pa.table(
            {
                "surface_norm": m.column("surface_norm"),
                "label": m.column("label"),
                "src": src,
            }
        )
        g = t.group_by(["surface_norm", "label", "src"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["surface_norm", "label", "src", "n"])

    partials = ann.map_batches(partial, batch_format="pyarrow")
    per_src = partials.groupby(["surface_norm", "label", "src"]).aggregate(
        Sum("n", alias_name="n")
    )
    facts = per_src.groupby(["surface_norm", "label"]).aggregate(
        Count(alias_name="n_sources"),
        Sum("n", alias_name="n_mentions"),
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "surface_norm": pa.array([], type=pa.string()),
                    "label": pa.array([], type=pa.string()),
                    "n_sources": pa.array([], type=pa.int64()),
                    "n_mentions": pa.array([], type=pa.int64()),
                    "corroborated": pa.array([], type=pa.int64()),
                    "entity_id": pa.array([], type=pa.string()),
                }
            )
        corr = pc.cast(
            pc.greater_equal(b.column("n_sources"), pa.scalar(min_sources)),
            pa.int64(),
        )
        ids = [
            entity_id(s, l)
            for s, l in zip(
                b.column("surface_norm").to_pylist(),
                b.column("label").to_pylist(),
            )
        ]
        return pa.table(
            {
                "surface_norm": b.column("surface_norm"),
                "label": b.column("label"),
                "n_sources": pc.cast(b.column("n_sources"), pa.int64()),
                "n_mentions": pc.cast(b.column("n_mentions"), pa.int64()),
                "corroborated": corr,
                "entity_id": pa.array(ids, type=pa.string()),
            }
        )

    return facts.map_batches(finish, batch_format="pyarrow")


def source_reliability(
    ann,
    *,
    doc_col: str = "doc_id",
    source_col: str = "source",
    min_sources: int = 2,
):
    """Knowledge-fusion source scoring (the other half of
    ``fact_corroboration``): per source, how many distinct facts it
    asserts and how many of those are independently corroborated
    (asserted by >= ``min_sources`` distinct sources overall, the
    asserting source included). ``n_corroborated / n_facts`` is the
    source's reliability rate — the prior a fusion system assigns to the
    source's UNcorroborated claims; emitted as exact integers so the
    oracle hash-matches (the division is the consumer's).

    Shape: the same combiner-bounded (fact, source) partial stream as
    ``fact_corroboration`` -> groupby-sum on the 3-part key -> the
    fact-level distinct-source table is GAZETTEER-bounded (one row per
    (surface, label)), so it broadcasts via ray.put and each (fact,
    source) row looks up its fact's source count with a vectorized
    index_in — no second shuffle join; the final per-source fold is a
    groupby on the (tiny) source key.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "surface_norm": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.string()),
                "src": pa.array([], type=pa.string()),
            }
        )
        if b.num_rows == 0:
            return empty
        m = explode_mentions(b, subj_col=doc_col)
        if m.num_rows == 0:
            return empty
        pos = pc.index_in(
            _as_combined(m.column(doc_col)), _as_combined(b.column(doc_col))
        )
        src = _as_combined(b.column(source_col)).cast(pa.string()).take(pos)
        t = pa.table(
            {
                "surface_norm": m.column("surface_norm"),
                "label": m.column("label"),
                "src": src,
            }
        )
        g = t.group_by(["surface_norm", "label", "src"]).aggregate([])
        return g

    per_src = (
        ann.map_batches(partial, batch_format="pyarrow")
        .groupby(["surface_norm", "label", "src"])
        .aggregate(Count(alias_name="_n"))
        .materialize()
    )
    # fact-level distinct-source counts: gazetteer-bounded -> broadcast
    fact_rows = (
        per_src.groupby(["surface_norm", "label"])
        .aggregate(Count(alias_name="n_sources"))
        .take_all()
    )
    keys = pa.array(
        [f"{r['surface_norm']}\x1f{r['label']}" for r in fact_rows],
        type=pa.string(),
    )
    counts = pa.array([r["n_sources"] for r in fact_rows], type=pa.int64())
    ref = ray.put((keys, counts))

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], type=pa.string()),
                    "one": pa.array([], type=pa.int64()),
                    "is_corr": pa.array([], type=pa.int64()),
                }
            )
        k_arr, c_arr = ray.get(ref)
        k = pc.binary_join_element_wise(
            _as_combined(b.column("surface_norm")).cast(pa.string()),
            _as_combined(b.column("label")).cast(pa.string()),
            "\x1f",
        )
        ns = pc.take(c_arr, pc.index_in(k, value_set=k_arr))
        return pa.table(
            {
                "src": b.column("src"),
                "one": pa.array([1] * b.num_rows, type=pa.int64()),
                "is_corr": pc.cast(
                    pc.greater_equal(ns, pa.scalar(min_sources)), pa.int64()
                ),
            }
        )

    flagged = per_src.map_batches(flag, batch_format="pyarrow")
    out = flagged.groupby("src").aggregate(
        Sum("one", alias_name="n_facts"),
        Sum("is_corr", alias_name="n_corroborated"),
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "n_facts": pa.array([], type=pa.int64()),
                    "n_corroborated": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "source": b.column("src"),
                "n_facts": pc.cast(b.column("n_facts"), pa.int64()),
                "n_corroborated": pc.cast(b.column("n_corroborated"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


FACT_BROADCAST_CAP = 1_000_000  # facts; above this the reliability fold
# switches from broadcast lookup to a hash-partitioned keyed join


def fact_corroboration_open(
    facts,
    *,
    key_cols: list[str],
    source_col: str = "source",
    min_sources: int = 2,
):
    """OPEN-VOCABULARY knowledge fusion: multi-source corroboration over an
    arbitrary fact table (one row per assertion, e.g. infobox extractions)
    — unlike ``fact_corroboration`` the fact key is NOT gazetteer-bounded,
    so nothing here may broadcast or driver-collect the fact table.

    Shape: per-batch combiner (groupby key+source inside ``map_batches``,
    output bounded by distinct (fact, source) per batch) -> ONE
    groupby-sum on (key..., source) -> ONE groupby on the fact key folding
    sources (count -> n_sources, sum -> n_mentions). Pure keyed shuffles;
    scales with distinct facts, never assertions."""
    from ray.data.aggregate import Count, Sum

    gcols = [*key_cols, source_col]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    **{c: pa.array([], type=pa.string()) for c in gcols},
                    "n": pa.array([], type=pa.int64()),
                }
            )
        g = b.select(gcols).group_by(gcols).aggregate([([], "count_all")])
        return g.rename_columns([*gcols, "n"])

    per_src = (
        facts.map_batches(partial, batch_format="pyarrow")
        .groupby(gcols)
        .aggregate(Sum("n", alias_name="n"))
    )
    out = per_src.groupby(key_cols).aggregate(
        Count(alias_name="n_sources"), Sum("n", alias_name="n_mentions")
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    **{c: pa.array([], type=pa.string()) for c in key_cols},
                    "n_sources": pa.array([], type=pa.int64()),
                    "n_mentions": pa.array([], type=pa.int64()),
                    "corroborated": pa.array([], type=pa.int64()),
                }
            )
        corr = pc.cast(
            pc.greater_equal(b.column("n_sources"), pa.scalar(min_sources)),
            pa.int64(),
        )
        cols = {c: b.column(c) for c in key_cols}
        cols["n_sources"] = pc.cast(b.column("n_sources"), pa.int64())
        cols["n_mentions"] = pc.cast(b.column("n_mentions"), pa.int64())
        cols["corroborated"] = corr
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def source_reliability_open(
    facts,
    *,
    key_cols: list[str],
    source_col: str = "source",
    min_sources: int = 2,
    broadcast_cap: int = FACT_BROADCAST_CAP,
    num_partitions: int = 8,
):
    """Open-vocabulary source reliability: per source, distinct facts
    asserted and how many are corroborated (asserted by >= ``min_sources``
    distinct sources overall). The fact-level distinct-source table is
    open-world here, so the fold is CAP-GATED: at most ``broadcast_cap``
    distinct facts it broadcasts (one ray.put, vectorized index_in lookup
    — cheapest when facts fit an executor); above the cap it switches to
    a hash-partitioned keyed JOIN on the fact key — the 100 TB path, no
    driver materialization. Set ``broadcast_cap=0`` to force the join
    path (the driver contract's infobox_source_reliability does, so the
    scale path is what the oracle checks)."""
    import ray
    from ray.data.aggregate import Count, Sum

    gcols = [*key_cols, source_col]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.string()) for c in gcols})
        return b.select(gcols).group_by(gcols).aggregate([])

    per_src = (
        facts.map_batches(partial, batch_format="pyarrow")
        .groupby(gcols)
        .aggregate(Count(alias_name="_n"))
        .materialize()
    )
    fact_counts = per_src.groupby(key_cols).aggregate(
        Count(alias_name="n_sources")
    )

    def fold(flagged):
        out = flagged.groupby(source_col).aggregate(
            Sum("one", alias_name="n_facts"),
            Sum("is_corr", alias_name="n_corroborated"),
        )

        def finish(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "source": pa.array([], type=pa.string()),
                        "n_facts": pa.array([], type=pa.int64()),
                        "n_corroborated": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "source": b.column(source_col),
                    "n_facts": pc.cast(b.column("n_facts"), pa.int64()),
                    "n_corroborated": pc.cast(
                        b.column("n_corroborated"), pa.int64()
                    ),
                }
            )

        return out.map_batches(finish, batch_format="pyarrow")

    def to_flags(b: pa.Table, ns) -> pa.Table:
        return pa.table(
            {
                source_col: b.column(source_col),
                "one": pa.array([1] * b.num_rows, type=pa.int64()),
                "is_corr": pc.cast(
                    pc.greater_equal(ns, pa.scalar(min_sources)), pa.int64()
                ),
            }
        )

    n_facts_total = fact_counts.count()
    if n_facts_total <= broadcast_cap:
        rows = fact_counts.take_all()
        keys = pa.array(
            ["\x1f".join(str(r[c]) for c in key_cols) for r in rows],
            type=pa.string(),
        )
        counts = pa.array([r["n_sources"] for r in rows], type=pa.int64())
        ref = ray.put((keys, counts))

        def flag_bcast(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        source_col: pa.array([], type=pa.string()),
                        "one": pa.array([], type=pa.int64()),
                        "is_corr": pa.array([], type=pa.int64()),
                    }
                )
            k_arr, c_arr = ray.get(ref)
            parts = [
                _as_combined(b.column(c)).cast(pa.string()) for c in key_cols
            ]
            k = parts[0]
            for p in parts[1:]:
                k = pc.binary_join_element_wise(k, p, "\x1f")
            ns = pc.take(c_arr, pc.index_in(k, value_set=k_arr))
            return to_flags(b, ns)

        flagged = per_src.map_batches(flag_bcast, batch_format="pyarrow")
        return fold(flagged)

    # join path: per_src (fact, source) x fact_counts (fact, n_sources)
    joined = per_src.join(
        fact_counts,
        "inner",
        num_partitions=num_partitions,
        on=tuple(key_cols),
    )

    def flag_join(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    source_col: pa.array([], type=pa.string()),
                    "one": pa.array([], type=pa.int64()),
                    "is_corr": pa.array([], type=pa.int64()),
                }
            )
        return to_flags(b, b.column("n_sources"))

    return fold(joined.map_batches(flag_join, batch_format="pyarrow"))


def canonical_entities_delta(ann, *, doc_col: str = "doc_id"):
    """Incremental-KG delta feed: compare the canonical entity tables of
    two crawls — the even-``doc_id`` corpus (old crawl) vs the odd one
    (new crawl, the repo-wide parity convention for base-vs-delta splits)
    — in ONE pass: (surface_norm, label, n_old, n_new, status, entity_id)
    with status ∈ {added, removed, changed, same}.

    This is the update stream an entity store consumes after each crawl
    refresh (the KG-level counterpart of the document-level
    ``snapshot_diff``). Shape: fused doc-local explode -> per-batch
    combiner emitting at most one row per (entity, parity) per batch ->
    one groupby-sum; mention rows never shuffle, and neither corpus is
    scanned twice.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "surface_norm": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.string()),
                "n_old": pa.array([], type=pa.int64()),
                "n_new": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        m = explode_mentions(b, subj_col=doc_col)
        if m.num_rows == 0:
            return empty
        ids = _as_combined(m.column(doc_col)).cast(pa.int64())
        par = ids.to_numpy(zero_copy_only=False) % 2
        t = pa.table(
            {
                "surface_norm": m.column("surface_norm"),
                "label": m.column("label"),
                "n_old": pa.array((par == 0).astype("int64")),
                "n_new": pa.array((par == 1).astype("int64")),
            }
        )
        g = t.group_by(["surface_norm", "label"]).aggregate(
            [("n_old", "sum"), ("n_new", "sum")]
        )
        return g.rename_columns(["surface_norm", "label", "n_old", "n_new"])

    partials = ann.map_batches(partial, batch_format="pyarrow")
    merged = partials.groupby(["surface_norm", "label"]).aggregate(
        Sum("n_old", alias_name="n_old"), Sum("n_new", alias_name="n_new")
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "surface_norm": pa.array([], type=pa.string()),
                    "label": pa.array([], type=pa.string()),
                    "n_old": pa.array([], type=pa.int64()),
                    "n_new": pa.array([], type=pa.int64()),
                    "status": pa.array([], type=pa.string()),
                    "entity_id": pa.array([], type=pa.string()),
                }
            )
        no = b.column("n_old").to_pylist()
        nn = b.column("n_new").to_pylist()
        status = [
            "added" if a == 0 else "removed" if c == 0 else
            "changed" if a != c else "same"
            for a, c in zip(no, nn)
        ]
        eids = [
            entity_id(s, l)
            for s, l in zip(
                b.column("surface_norm").to_pylist(), b.column("label").to_pylist()
            )
        ]
        return pa.table(
            {
                "surface_norm": b.column("surface_norm"),
                "label": b.column("label"),
                "n_old": b.column("n_old"),
                "n_new": b.column("n_new"),
                "status": pa.array(status, type=pa.string()),
                "entity_id": pa.array(eids, type=pa.string()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def entity_trend(ann, *, n_snapshots: int = 8, doc_col: str = "doc_id"):
    """Rising/falling entity detection: exact integer least-squares slope
    of per-snapshot mention counts over the K crawl snapshots
    (snap = doc_id % K, zero-filled — absent snapshots contribute 0 to
    both moments, so no densification pass is needed).

    Fitting n_s = a + b*s over s = 0..K-1 gives
    ``b = (K*Σ(s·n_s) − Σs·Σn) / (K*Σs² − (Σs)²)``; the denominator is a
    corpus-wide constant, so the emitted ``slope_num`` (numerator, exact
    int64) ranks entities identically. Σ(s·n_s) folds to a plain sum of
    each mention's own snapshot id — ONE per-batch combiner row per
    entity (count + snap sum), one groupby; no per-snap intermediate.

    Output: (surface_norm, label, n_mentions, slope_num, entity_id).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    sum_s = n_snapshots * (n_snapshots - 1) // 2

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "surface_norm": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "ssum": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        m = explode_mentions(b, subj_col=doc_col)
        if m.num_rows == 0:
            return empty
        ids = _as_combined(m.column(doc_col)).cast(pa.int64())
        snap = ids.to_numpy(zero_copy_only=False) % n_snapshots
        t = pa.table(
            {
                "surface_norm": m.column("surface_norm"),
                "label": m.column("label"),
                "n": pa.array(np.ones(len(snap), dtype="int64")),
                "ssum": pa.array(snap.astype("int64")),
            }
        )
        g = t.group_by(["surface_norm", "label"]).aggregate(
            [("n", "sum"), ("ssum", "sum")]
        )
        return g.rename_columns(["surface_norm", "label", "n", "ssum"])

    partials = ann.map_batches(partial, batch_format="pyarrow")
    merged = partials.groupby(["surface_norm", "label"]).aggregate(
        Sum("n", alias_name="n_mentions"), Sum("ssum", alias_name="ssum")
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "surface_norm": pa.array([], type=pa.string()),
                    "label": pa.array([], type=pa.string()),
                    "n_mentions": pa.array([], type=pa.int64()),
                    "slope_num": pa.array([], type=pa.int64()),
                    "entity_id": pa.array([], type=pa.string()),
                }
            )
        n = _as_combined(b.column("n_mentions")).to_numpy(zero_copy_only=False)
        ss = _as_combined(b.column("ssum")).to_numpy(zero_copy_only=False)
        slope = n_snapshots * ss - sum_s * n
        eids = [
            entity_id(s, l)
            for s, l in zip(
                b.column("surface_norm").to_pylist(), b.column("label").to_pylist()
            )
        ]
        return pa.table(
            {
                "surface_norm": b.column("surface_norm"),
                "label": b.column("label"),
                "n_mentions": b.column("n_mentions"),
                "slope_num": pa.array(slope.astype("int64")),
                "entity_id": pa.array(eids, type=pa.string()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")
