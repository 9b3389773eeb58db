"""Proximity-windowed relation-candidate generation.

The classic KG relation-extraction candidate step between gazetteer
annotation and relation scoring: two accepted mentions of DIFFERENT
entities in the same document whose character gap (``b.start - a.end``
with ``a.start < b.start``) is within a window become a directed
candidate pair (doc_id, subj, obj, gap).

Distributed shape: ZERO shuffles — a document's mentions are contiguous
within one batch by construction (explode_mentions is per-batch over
whole documents, the same locality invariant ``cooccurrence_pairs`` and
``q_graph_degree`` exploit), so pair generation is a vectorized
per-batch pass.  Per doc the mention list is capped at the ``cap`` first
rows in (start, end, eid) order (quadratic guard for entity-dense pages,
mirrored by the SQL oracle's QUALIFY row_number).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MENTION_CAP = 64
REL_WINDOW = 40  # max chars between the end of a and the start of b


def _empty() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "subj": pa.array([], type=pa.string()),
            "obj": pa.array([], type=pa.string()),
            "gap": pa.array([], type=pa.int64()),
        }
    )


def _rel_batch(
    batch: pa.Table, *, window: int = REL_WINDOW, cap: int = MENTION_CAP
) -> pa.Table:
    from .canonicalize import entity_id

    if batch.num_rows == 0:
        return _empty()
    sn = batch.column("surface_norm")
    if isinstance(sn, pa.ChunkedArray):
        sn = sn.combine_chunks()
    lb = batch.column("label")
    if isinstance(lb, pa.ChunkedArray):
        lb = lb.combine_chunks()
    # eid per mention via md5 per DISTINCT (surface_norm, label) pair
    key = pc.binary_join_element_wise(
        sn.cast(pa.large_string()),
        lb.cast(pa.large_string()),
        pa.scalar("\x00", type=pa.large_string()),
    )
    enc = pc.dictionary_encode(key)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    eid_vocab = np.array(
        [entity_id(*k.rsplit("\x00", 1)) for k in enc.dictionary.to_pylist()]
    )
    eid = eid_vocab[codes]
    docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
    start = batch.column("start").to_numpy(zero_copy_only=False).astype(np.int64)
    end = batch.column("end").to_numpy(zero_copy_only=False).astype(np.int64)
    # doc grouping must survive the sort: docs are contiguous but not
    # globally ordered, so group by first-occurrence run id
    grp = np.cumsum(np.r_[True, docs[1:] != docs[:-1]]) - 1
    order = np.lexsort((eid, end, start, grp))
    grp, start, end, eid, docs = (
        grp[order], start[order], end[order], eid[order], docs[order]
    )
    bounds = np.flatnonzero(np.r_[True, grp[1:] != grp[:-1], True])
    out_doc, out_s, out_o, out_g = [], [], [], []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        hi = min(hi, lo + cap)
        k = hi - lo
        if k < 2:
            continue
        iu, ju = np.triu_indices(k, 1)
        s_i, s_j = start[lo + iu], start[lo + ju]
        gap = s_j - end[lo + iu]
        keep = (
            (s_j > s_i)
            & (eid[lo + iu] != eid[lo + ju])
            & (gap >= 0)
            & (gap <= window)
        )
        if not keep.any():
            continue
        out_doc.append(np.full(int(keep.sum()), docs[lo]))
        out_s.append(eid[lo + iu[keep]])
        out_o.append(eid[lo + ju[keep]])
        out_g.append(gap[keep])
    if not out_doc:
        return _empty()
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
            "subj": pa.array(np.concatenate(out_s)),
            "obj": pa.array(np.concatenate(out_o)),
            "gap": pa.array(np.concatenate(out_g), type=pa.int64()),
        }
    )


def relation_candidates(
    mentions,
    *,
    window: int = REL_WINDOW,
    cap: int = MENTION_CAP,
    annotated: bool = False,
):
    """Mention Dataset -> Dataset(doc_id, subj, obj, gap) of
    proximity-windowed directed candidate pairs (module docstring).
    ``annotated=True`` fuses the mention explode into the batch fn so a
    document's mentions are whole by construction (doc locality survives
    Ray's dynamic block splitting)."""
    if annotated:
        from .canonicalize import explode_mentions

        return mentions.map_batches(
            lambda b: _rel_batch(
                explode_mentions(b, subj_col="doc_id"), window=window, cap=cap
            ),
            batch_format="pyarrow",
        )
    return mentions.map_batches(
        lambda b: _rel_batch(b, window=window, cap=cap), batch_format="pyarrow"
    )


CTX_WINDOW = 20


def _ctx_batch(batch: pa.Table, *, window: int = CTX_WINDOW) -> pa.Table:
    """Mentions batch (with dictionary-encoded ``doc_text``) -> per-mention
    context snippet ``text[max(start-w,0):min(end+w,len)]``.  One vectorized
    buffer gather via canonicalize._slice_surfaces — no per-mention Python,
    no text copies beyond the snippets themselves."""
    from .canonicalize import _slice_surfaces

    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "surface_norm": pa.array([], type=pa.string()),
                "start": pa.array([], type=pa.int64()),
                "end": pa.array([], type=pa.int64()),
                "context": pa.array([], type=pa.string()),
            }
        )
    dt = batch.column("doc_text")
    if isinstance(dt, pa.ChunkedArray):
        dt = dt.combine_chunks()
    texts, parents = dt.dictionary, dt.indices
    start = batch.column("start").to_numpy(zero_copy_only=False).astype(np.int64)
    end = batch.column("end").to_numpy(zero_copy_only=False).astype(np.int64)
    lens = (
        pc.utf8_length(texts)
        .cast(pa.int64())
        .take(parents)
        .to_numpy(zero_copy_only=False)
    )
    lo = np.maximum(start - window, 0)
    hi = np.minimum(end + window, lens)
    ctx = _slice_surfaces(texts, parents, pa.array(lo), pa.array(hi))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "surface_norm": batch.column("surface_norm"),
            "start": pa.array(start),
            "end": pa.array(end),
            "context": ctx,
        }
    )


def mention_contexts(mentions, *, window: int = CTX_WINDOW):
    """Mention Dataset (keep_text=True) -> Dataset(doc_id, surface_norm,
    start, end, context): KWIC snippets for linker/relation training data."""
    return mentions.map_batches(
        lambda b: _ctx_batch(b, window=window), batch_format="pyarrow"
    )


def kg_negative_samples(triples_ds, entity_ids, *, sep: str = "|"):
    """TransE-style corrupted negatives for KG-embedding training: each
    (subj, pred, obj) triple gets a deterministic ``neg_obj`` drawn from
    the entity universe by hash — ``entities[md5(subj|pred|obj) % n]``,
    bumped one slot when the draw collides with the true ``obj`` so the
    negative is always a corruption. Deterministic (resumable / re-runnable
    with identical output, unlike RNG sampling) and uniform across the
    universe because md5 is.

    ``entity_ids``: the OCCURRING entity universe — gazetteer-bounded, so
    it broadcasts (``ray.put`` once, fetched once per worker); the scoring
    pass itself is zero-shuffle. md5 runs once per DISTINCT triple key via
    np.unique (surface repetition makes triples Zipf-repetitive)."""
    import numpy as np
    import ray

    ents = np.asarray(sorted({str(e) for e in entity_ids}))
    if len(ents) < 2:
        raise ValueError("negative sampling needs >= 2 entities")
    ref = ray.put(ents)

    from .dedup_approx import h64

    def corrupt(batch: pa.Table) -> pa.Table:
        e = ray.get(ref)
        n = len(e)
        cols = [batch.column(c) for c in ("subj", "pred", "obj")]
        cols = [
            (c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c).cast(
                pa.string()
            )
            for c in cols
        ]
        key = pc.binary_join_element_wise(*cols, sep).to_numpy(
            zero_copy_only=False
        )
        if len(key):
            uniq, inv = np.unique(key, return_inverse=True)
            idx = np.fromiter(
                (h64(k) % n for k in uniq), dtype=np.int64, count=len(uniq)
            )[inv]
            obj = cols[2].to_numpy(zero_copy_only=False)
            c0 = e[idx]
            c1 = e[(idx + 1) % n]
            neg = np.where(c0 != obj, c0, c1)
        else:
            neg = np.array([], dtype=object)
        return pa.table(
            {
                "subj": cols[0],
                "pred": cols[1],
                "obj": cols[2],
                "neg_obj": pa.array(neg, type=pa.string()),
            }
        )

    return triples_ds.map_batches(corrupt, batch_format="pyarrow")


def infobox_facts(pages, *, id_col: str = "doc_id", carry_cols: list[str] | None = None):
    """Semi-structured fact extraction: parse each page's
    ``<table class="infobox">`` into (id, attr, value) rows — the
    WebTables / DBpedia-infobox KG-construction step (each row is a
    (subject-page, attribute, value) triple candidate feeding the same
    canonicalization shuffle the text mentions use).

    Stateless ``map_batches`` over (id, html) — the parse
    (kernel/htmlextract.extract_infobox) is a compiled-regex pass per
    page, comments/scripts stripped, cells tag-stripped + unescaped.
    Zero shuffles; output volume = rows-per-infobox x pages.

    ``carry_cols`` propagates page-level provenance columns (e.g. the
    source/host) onto each emitted fact via a batch-local take — the
    zero-shuffle alternative to a facts-to-pages join."""
    from ..kernel.htmlextract import extract_infobox

    carry = carry_cols or []

    def parse(b: pa.Table) -> pa.Table:
        cols: dict = {
            id_col: pa.array([], type=pa.int64()),
            "attr": pa.array([], type=pa.string()),
            "value": pa.array([], type=pa.string()),
        }
        empty = pa.table(
            {**cols, **{c: b.column(c).combine_chunks().slice(0, 0) for c in carry}}
        ) if b.num_rows else pa.table(cols)
        if b.num_rows == 0:
            return empty
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        htmls = b.column("html")
        if isinstance(htmls, pa.ChunkedArray):
            htmls = htmls.combine_chunks()
        out_id, out_attr, out_val, out_row = [], [], [], []
        for i, page in enumerate(htmls.to_pylist()):
            did = ids[i].as_py()
            for attr, val in extract_infobox(page):
                out_id.append(did)
                out_attr.append(attr)
                out_val.append(val)
                out_row.append(i)
        if not out_id:
            return empty
        t = pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "attr": pa.array(out_attr, type=pa.string()),
                "value": pa.array(out_val, type=pa.string()),
            }
        )
        if carry:
            idx = pa.array(out_row, type=pa.int64())
            for c in carry:
                col = b.column(c)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                t = t.append_column(c, col.take(idx))
        return t

    return pages.map_batches(parse, batch_format="pyarrow")


def entity_context_features(ann, *, window: int = CTX_WINDOW, dims: int = 16):
    """Distributional entity representations: hashed bag-of-context-words
    per canonical entity — the text-side counterpart of the graph-side
    FastRP embedding (entity-linking / clustering features that need no
    trained model). Every mention contributes its KWIC context window's
    word-class tokens, feature-hashed into ``dims`` integer buckets
    (h64(token) % dims — the classifier/DSIR hashing-trick convention).

    Shape: fused doc-local explode + vectorized context gather per batch,
    ONE dictionary-encode per batch computes token buckets per DISTINCT
    token, a 2-D scatter-add folds (entity, bucket) counts to ONE row per
    entity per batch (combiner bounded by gazetteer x dims regardless of
    batch size), then a single groupby-sum. Output: (surface_norm, label,
    f0..f{dims-1}, entity_id)."""
    from ray.data.aggregate import Sum

    from ..stages.dedup_approx import h64
    from ..stages.text_analysis import WORD_CLASS_RE
    from .canonicalize import entity_id, explode_mentions

    fcols = [f"f{k}" for k in range(dims)]

    def partial(b: pa.Table) -> pa.Table:
        empty_cols: dict = {
            "surface_norm": pa.array([], type=pa.string()),
            "label": pa.array([], type=pa.string()),
        }
        for c in fcols:
            empty_cols[c] = pa.array([], type=pa.int64())
        empty = pa.table(empty_cols)
        if b.num_rows == 0:
            return empty
        m = explode_mentions(b, keep_text=True)
        if m.num_rows == 0:
            return empty
        ctx = _ctx_batch(m, window=window).column("context")
        if isinstance(ctx, pa.ChunkedArray):
            ctx = ctx.combine_chunks()
        toks = pc.split_pattern_regex(ctx, "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty]
        if not len(flat):
            return empty
        enc = pc.dictionary_encode(flat)
        vocab = enc.dictionary.to_pylist()
        vb = np.fromiter(
            (h64(w) % dims for w in vocab), dtype=np.int64, count=len(vocab)
        )
        buckets = vb[enc.indices.to_numpy(zero_copy_only=False)]
        # entity key per mention -> per (entity, bucket) scatter-add
        key = pc.binary_join_element_wise(
            m.column("surface_norm").cast(pa.large_string()),
            m.column("label").cast(pa.large_string()),
            pa.scalar("\x00", type=pa.large_string()),
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        kenc = pc.dictionary_encode(key)
        kcodes = kenc.indices.to_numpy(zero_copy_only=False)
        ne = len(kenc.dictionary)
        counts = np.zeros((ne, dims), dtype=np.int64)
        np.add.at(counts, (kcodes[parents], buckets), 1)
        sn, lb = zip(*(k.rsplit("\x00", 1) for k in kenc.dictionary.to_pylist()))
        cols: dict = {
            "surface_norm": pa.array(sn, type=pa.string()),
            "label": pa.array(lb, type=pa.string()),
        }
        for k, c in enumerate(fcols):
            cols[c] = pa.array(counts[:, k])
        return pa.table(cols)

    partials = ann.map_batches(partial, batch_format="pyarrow")
    merged = partials.groupby(["surface_norm", "label"]).aggregate(
        *[Sum(c, alias_name=c) for c in fcols]
    )

    def with_id(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            cols = {
                "surface_norm": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.string()),
            }
            for c in fcols:
                cols[c] = pa.array([], type=pa.int64())
            cols["entity_id"] = pa.array([], type=pa.string())
            return pa.table(cols)
        eids = [
            entity_id(s, l)
            for s, l in zip(
                b.column("surface_norm").to_pylist(), b.column("label").to_pylist()
            )
        ]
        return b.append_column("entity_id", pa.array(eids, type=pa.string()))

    return merged.map_batches(with_id, batch_format="pyarrow")
