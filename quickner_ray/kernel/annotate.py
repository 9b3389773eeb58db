"""Annotation kernels — the library-level matching functions.

``annotate_text`` is the single-document kernel (the same code the Ray
detector actor runs per row); ``naive_find_index`` ports the reference's
legacy non-automaton matcher (quickner-core/src/quickner.rs:68-116) with its
documented quirks (BYTE offsets from ``match_indices``, char-indexed
neighbor probes) — it is dead in the reference's production path and exists
here only as a parity artifact / secondary test oracle.
"""

from __future__ import annotations

from .automaton import Gazetteer, Span
from .chars import ASCII_PUNCT, RUST_WHITESPACE, char_at


def annotate_text(
    text: str, gazetteer: Gazetteer
) -> tuple[str, list[Span]]:
    """Annotate one document. Returns ``(matched_text, spans)`` where
    ``matched_text`` is the text the spans index into — lowercased when the
    gazetteer is case-insensitive, replicating the reference's in-place
    lowercase of document text (quickner.rs:266-270, document.rs:66-71)."""
    t = text if gazetteer.case_sensitive else text.lower()
    return t, gazetteer.annotate(t)


def annotate_texts(texts: list[str], gazetteer: Gazetteer) -> tuple[list[str], list[list[Span]]]:
    """Batch form of ``annotate_text`` (one regex pass over the batch)."""
    if gazetteer.case_sensitive:
        lowered = texts
    else:
        lowered = [t.lower() for t in texts]
    return lowered, gazetteer.annotate_batch(lowered)


def naive_find_index(text: str, entities: list[tuple[str, str]]) -> list[tuple[int, int, str]]:
    """Legacy ``find_index`` (quickner.rs:68-116): per-entity substring scan,
    returns BYTE offsets (match_indices), simpler acceptance rules. Not used
    by the production pipeline."""
    out: list[tuple[int, int, str]] = []
    n_char = len(text)
    b = text.encode("utf-8")
    for name, label in entities:
        target_len = len(name.encode("utf-8"))
        nb = name.encode("utf-8")
        found = None
        start = b.find(nb)
        while start != -1:
            # quirk: byte offset `start` probed as a char index (quickner.rs:77-99)
            prev = char_at(text, start - 1, n_char) if start > 0 else "N"
            nxt = char_at(text, start + target_len, n_char)
            if (
                start == 0
                or prev in RUST_WHITESPACE
                or prev in ASCII_PUNCT
                or (
                    start + target_len == len(b)
                    or nxt in RUST_WHITESPACE
                    or (nxt in ASCII_PUNCT and nxt != "." and (start > 0 and prev != "."))
                )
            ):
                found = (start, start + target_len, label)
                break
            start = b.find(nb, start + 1)
        if found is not None:
            out.append(found)
    out.sort(key=lambda t: t[0])
    dedup: list[tuple[int, int, str]] = []
    prev_t = None
    for t in out:
        if t != prev_t:
            dedup.append(t)
            prev_t = t
    return dedup
