"""Entity linking: mention -> canonical entity via candidate scoring.

The north star names "entity-link candidate scoring" as part of the
actor-pool stage. Gazetteer surfaces are ambiguous (the same surface form
can carry several (label -> canonical entity) readings — the reference
keeps ALL overlapping readings, SURVEY §2.4); this stage disambiguates each
mention:

- **Alias table** (built once, driver-side, from the canonical-entity table
  or a curated alias source): ``surface_norm -> [(entity_id, label, prior)]``
  where ``prior`` is the corpus-level mention count (or any popularity
  measure). Broadcast via ``ray.put``; deserialized once per actor.
- **Candidate scoring** per mention batch (vectorizable parts vectorized,
  per-mention work bounded by the candidate count, usually 1-3):
  ``score = prior_weight * log1p(prior) + context_weight * jaccard(window
  tokens, entity context tokens)``; deterministic tie-break on
  (score desc, label asc, entity_id asc).
- Context tokens for an entity default to the token set of its aliases
  (extendable to description text when a KB provides one).

Partitioning: pure per-row map — no shuffle; the alias table is the only
shared state (small side, broadcast once).
"""

from __future__ import annotations

import math
import re

import pyarrow as pa

from ..kernel.rounding import round_away

_TOKEN_RE = re.compile(r"[a-z0-9]+")

AliasTable = dict[str, list[tuple[str, str, float]]]  # surface -> [(eid, label, prior)]


def build_alias_table(
    entities: list[tuple[str, str, float]],
) -> tuple[AliasTable, dict[str, frozenset]]:
    """``entities`` = (surface_norm, label, prior) rows (e.g. the canonical
    entity table's (surface_norm, label, n_mentions)). Returns the alias
    table plus per-entity context token sets."""
    from .canonicalize import entity_id

    table: AliasTable = {}
    contexts: dict[str, set] = {}
    for surface, label, prior in entities:
        eid = entity_id(surface, label)
        table.setdefault(surface, []).append((eid, label, float(prior)))
        contexts.setdefault(eid, set()).update(_TOKEN_RE.findall(surface.lower()))
    # deterministic candidate order
    for surface in table:
        table[surface].sort(key=lambda c: (-c[2], c[1], c[0]))
    return table, {k: frozenset(v) for k, v in contexts.items()}


def score_candidates(
    candidates: list[tuple[str, str, float]],
    context_tokens: frozenset,
    entity_contexts: dict[str, frozenset],
    *,
    prior_weight: float = 1.0,
    context_weight: float = 2.0,
) -> list[tuple[float, str, str]]:
    """Score each (eid, label, prior) candidate; returns
    [(score, eid, label)] sorted best-first (deterministic)."""
    out = []
    for eid, label, prior in candidates:
        ctx = entity_contexts.get(eid, frozenset())
        if ctx and context_tokens:
            inter = len(ctx & context_tokens)
            j = inter / (len(ctx) + len(context_tokens) - inter) if inter else 0.0
        else:
            j = 0.0
        # ln(1.0 + prior) via math.log — bit-identical to DuckDB's ln() on
        # this platform (math.log1p is NOT), which keeps the driver oracle
        # hash-exact; priors are integers so 1.0 + prior is exact
        score = prior_weight * math.log(1.0 + prior) + context_weight * j
        out.append((score, eid, label))
    out.sort(key=lambda t: (-t[0], t[2], t[1]))
    return out


class EntityLinker:
    """Actor-pool batch UDF over MENTION rows (needs ``surface_norm`` and a
    doc-text or token-context column). Adds ``linked_entity_id``,
    ``link_score``, ``n_candidates``."""

    def __init__(
        self,
        alias_ref,
        *,
        text_col: str = "doc_text",
        window: int = 50,
        prior_weight: float = 1.0,
        context_weight: float = 2.0,
    ):
        import ray

        payload = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        self.aliases, self.contexts = payload
        self.text_col = text_col
        self.window = window
        self.prior_weight = prior_weight
        self.context_weight = context_weight

    def _context(self, text: str | None, start: int, end: int) -> frozenset:
        if not text:
            return frozenset()
        lo = max(0, start - self.window)
        hi = min(len(text), end + self.window)
        return frozenset(_TOKEN_RE.findall(text[lo:hi].lower()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column("surface_norm").to_pylist()
        texts = (
            batch.column(self.text_col).to_pylist()
            if self.text_col in batch.column_names
            else [None] * len(surfaces)
        )
        starts = (
            batch.column("start").to_pylist()
            if "start" in batch.column_names
            else [0] * len(surfaces)
        )
        ends = (
            batch.column("end").to_pylist()
            if "end" in batch.column_names
            else [0] * len(surfaces)
        )
        eids, scores, ncands = [], [], []
        for surf, text, s, e in zip(surfaces, texts, starts, ends):
            cands = self.aliases.get(surf, [])
            if not cands:
                eids.append(None)
                scores.append(0.0)
                ncands.append(0)
                continue
            ranked = score_candidates(
                cands,
                self._context(text, s, e),
                self.contexts,
                prior_weight=self.prior_weight,
                context_weight=self.context_weight,
            )
            best = ranked[0]
            eids.append(best[1])
            scores.append(round_away(best[0], 6))
            ncands.append(len(cands))
        out = batch.append_column("linked_entity_id", pa.array(eids, type=pa.string()))
        out = out.append_column("link_score", pa.array(scores, type=pa.float64()))
        out = out.append_column("n_candidates", pa.array(ncands, type=pa.int64()))
        return out


def link_mentions(
    mentions_ds,
    entities: list[tuple[str, str, float]],
    *,
    text_col: str = "doc_text",
    batch_size: int = 4096,
    concurrency=None,
    **scoring,
):
    """Attach the linker stage. ``entities`` is the (surface, label, prior)
    candidate source — typically the canonical-entity table collected
    driver-side (small) or a curated KB alias file.

    The alias table is LIGHT broadcast state (plasma-zero-copy Arrow), so
    the default runs as a task stage with a once-per-worker-process instance
    (no actor-pool spin-up); pass ``concurrency`` to force a bounded actor
    pool (e.g. when the alias table is huge and copies must be capped)."""
    import ray

    payload = build_alias_table(entities)
    ref = ray.put(payload)
    if concurrency is None:
        from .taskstate import task_stage

        return mentions_ds.map_batches(
            task_stage(EntityLinker, alias_ref=ref, text_col=text_col, **scoring),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return mentions_ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"alias_ref": ref, "text_col": text_col, **scoring},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
