"""Vectorized gazetteer matcher — the ASCII/token fast path.

For the dominant web-scale case (ASCII batch text, gazetteer names that are
word sequences over non-boundary chars joined by single spaces), the whole
match pipeline runs as numpy/Arrow array ops with NO per-match Python:

1. byte-LUT word segmentation of the '\\n'-joined batch (boundary class ==
   the reference's ws+punct predicate sets, chars.py);
2. batch words extracted with one gather, ``pc.dictionary_encode`` -> the
   per-batch vocabulary (Zipf: small), pattern lookup touches UNIQUE words
   only;
3. candidate spans for 1..k-token patterns via vectorized code/adjacency
   compares (single-space adjacency is required — the pattern is a literal);
4. rule-4 end-aligned candidates (byte-aligned probe, per doc — bounded by
   distinct name shapes);
5. the reference's boundary rules 1-6 evaluated as vectorized byte-LUT
   boolean algebra (ASCII: char index == byte index, so rule 5/6's
   ``start + target_len`` position equals ``end``);
6. dedup + (start, end, label) ordering via ``np.unique``/``np.lexsort``.

Completeness vs the automaton path: every span the reference ACCEPTS starts
at char 0 or after a ws/punct char (rules 1-3, 5, 6) or is byte-end-aligned
(rule 4, step 4 here); a pattern matching a proper prefix of a longer word
is always rejected by the rules (next char is alphanumeric, and rule 4
cannot fire mid-word), so word-exact candidates are sufficient. Property
tests pin equivalence against both the regex path and the brute-force
oracle.
"""

from __future__ import annotations

import numpy as np

from .chars import ASCII_PUNCT, RUST_WHITESPACE

# byte LUTs for the reference predicates (ASCII range)
LUT_WS = np.zeros(256, dtype=bool)
for _c in RUST_WHITESPACE:
    if ord(_c) < 256:
        LUT_WS[ord(_c)] = True
LUT_PU = np.zeros(256, dtype=bool)
for _c in ASCII_PUNCT:
    LUT_PU[ord(_c)] = True
LUT_BOUND = LUT_WS | LUT_PU
_SENT = ord("N")  # out-of-range placeholder (fails both predicates)
_DOT = ord(".")
_BOUNDARY_CHARS = frozenset(c for c in (RUST_WHITESPACE | ASCII_PUNCT) if ord(c) < 128)


def is_token_name(name: str) -> bool:
    """True if ``name`` is a single-space-joined sequence of non-empty
    tokens containing no boundary-class chars (the vectorizable shape)."""
    if not name or not name.isascii():
        return False
    toks = name.split(" ")
    if any(t == "" for t in toks):
        return False
    return not any(ch in _BOUNDARY_CHARS for t in toks for ch in t)


def compile_token_patterns(names: list[str]) -> dict | None:
    """Pattern structures for the vector path, or None if ANY name is not
    token-shaped (caller falls back to the regex path entirely).

    ``first_keys``/``key_groups`` let the scan probe ALL first tokens with
    ONE searchsorted pass over the batch's word keys — patterns whose first
    token is absent from the batch (the overwhelming majority for a 10^5-name
    gazetteer) cost nothing.
    """
    by_first: dict[str, list[tuple[tuple[str, ...], int]]] = {}
    for pid, name in enumerate(names):
        if not is_token_name(name):
            return None
        toks = tuple(name.split(" "))
        by_first.setdefault(toks[0], []).append((toks, pid))
    key_to_toks: dict[int, list[str]] = {}
    for tok in by_first:
        key_to_toks.setdefault(_token_key(tok.encode("ascii")), []).append(tok)
    first_keys = np.array(sorted(key_to_toks), dtype=np.int64)
    key_groups = [key_to_toks[int(k)] for k in first_keys]
    return {"by_first": by_first, "first_keys": first_keys, "key_groups": key_groups}


def _word_segments(data: np.ndarray):
    """Word [start, end) byte offsets over the mega buffer."""
    if len(data) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    bnd = LUT_BOUND[data]
    nonb = ~bnd
    prev_bnd = np.empty_like(bnd)
    prev_bnd[0] = True
    prev_bnd[1:] = bnd[:-1]
    next_bnd = np.empty_like(bnd)
    next_bnd[-1] = True
    next_bnd[:-1] = bnd[1:]
    w_start = np.flatnonzero(nonb & prev_bnd)
    w_end = np.flatnonzero(nonb & next_bnd) + 1  # exclusive
    return w_start, w_end


def _word_keys(data: np.ndarray, w_start: np.ndarray, w_end: np.ndarray) -> np.ndarray:
    """Packed per-word key (len, first byte, last byte, byte-sum) — a cheap
    vectorized word signature. Collisions are resolved by exact byte
    verification at CANDIDATE positions only (match-count work)."""
    # int32 cumsum: max total 127 * len(data) stays < 2^31 for < 16M bytes;
    # larger buffers fall back to int64
    dt = np.int32 if len(data) < 16_000_000 else np.int64
    cs = np.zeros(len(data) + 1, dtype=dt)
    np.cumsum(data, out=cs[1:])
    wsum = (cs[w_end] - cs[w_start]).astype(np.int64)
    wlen = w_end - w_start
    first = data[w_start].astype(np.int64)
    last = data[w_end - 1].astype(np.int64)
    return (wlen << 40) | (first << 32) | (last << 24) | (wsum & 0xFFFFFF)


def _token_key(tok: bytes) -> int:
    return (
        (len(tok) << 40)
        | (tok[0] << 32)
        | (tok[-1] << 24)
        | (sum(tok) & 0xFFFFFF)
    )


def _token_candidates(
    data: np.ndarray,
    w_start: np.ndarray,
    word_keys: np.ndarray,
    tok: bytes,
    cache: dict,
) -> np.ndarray:
    """Sorted word indices whose word == tok exactly (key filter + exact
    byte verify at candidates)."""
    got = cache.get(tok)
    if got is not None:
        return got
    cand = np.flatnonzero(word_keys == _token_key(tok))
    if len(cand):
        L = len(tok)
        mat = data[w_start[cand][:, None] + np.arange(L, dtype=np.int64)[None, :]]
        tok_arr = np.frombuffer(tok, dtype=np.uint8)
        cand = cand[(mat == tok_arr[None, :]).all(axis=1)]
    cache[tok] = cand
    return cand


def scan_batch_arrays(gaz, texts: list[str]):
    """Vector-path scan of (already case-normalized, ASCII) texts.

    Returns accepted matches as numpy arrays ``(doc_idx, start, end, pid)``
    sorted by (doc, start, end, label-rank) with exact duplicates removed —
    the reference's output ordering. Caller guarantees: all texts ASCII,
    ``gaz.token_spec`` is not None.
    """
    import pyarrow.compute as pc

    n_docs = len(texts)
    if n_docs == 0:
        return (np.empty(0, np.int64),) * 4
    mega = "\n".join(texts)
    data = np.frombuffer(mega.encode("ascii"), dtype=np.uint8)
    n = len(data)
    doc_starts = np.zeros(n_docs + 1, dtype=np.int64)
    acc = 0
    for i, t in enumerate(texts):
        doc_starts[i] = acc
        acc += len(t) + 1
    doc_starts[n_docs] = acc
    doc_lens = np.diff(doc_starts) - 1  # byte length of each doc

    w_start, w_end = _word_segments(data)
    n_words = len(w_start)

    cand_s: list[np.ndarray] = []
    cand_e: list[np.ndarray] = []
    cand_p: list[np.ndarray] = []

    if n_words:
        word_keys = _word_keys(data, w_start, w_end)
        tok_cache: dict[bytes, np.ndarray] = {}
        member_cache: dict[bytes, np.ndarray] = {}
        spec = gaz.token_spec
        by_first = spec["by_first"]
        data_pad = np.append(data, np.uint8(32))
        # ONE searchsorted probe finds every word that key-matches any first
        # token; pattern count doesn't multiply the scan cost
        fk = spec["first_keys"]
        pos = np.searchsorted(fk, word_keys)
        safe = np.minimum(pos, len(fk) - 1) if len(fk) else pos
        hit_mask = (pos < len(fk)) & (fk[safe] == word_keys) if len(fk) else np.zeros(0, bool)
        wi = np.flatnonzero(hit_mask)
        gi = pos[wi]
        order = np.argsort(gi, kind="stable")
        wi, gi = wi[order], gi[order]
        group_ids, group_starts = np.unique(gi, return_index=True)
        group_bounds = np.append(group_starts, len(wi))
        for gidx, g in enumerate(group_ids):
            members_g = wi[group_bounds[gidx] : group_bounds[gidx + 1]]
            for first_tok in spec["key_groups"][int(g)]:
                tokb = first_tok.encode("ascii")
                L = len(tokb)
                mat = data[
                    w_start[members_g][:, None] + np.arange(L, dtype=np.int64)[None, :]
                ]
                tok_arr = np.frombuffer(tokb, dtype=np.uint8)
                base = members_g[(mat == tok_arr[None, :]).all(axis=1)]
                base = np.sort(base)
                tok_cache[tokb] = base
                if not len(base):
                    continue
                for toks, pid in by_first[first_tok]:
                    ok = base
                    for j in range(1, len(toks)):
                        ok = ok[ok + j < n_words]  # the j-th next word must exist
                        if not len(ok):
                            break
                        tb = toks[j].encode("ascii")
                        member = member_cache.get(tb)
                        if member is None:
                            member = np.zeros(n_words, dtype=bool)
                            member[
                                _token_candidates(data, w_start, word_keys, tb, tok_cache)
                            ] = True
                            member_cache[tb] = member
                        nxt_i = ok + j
                        prev_end = w_end[nxt_i - 1]
                        # next word matches the token, separated by EXACTLY
                        # one char and it is a space (the pattern is literal)
                        good = (
                            member[nxt_i]
                            & (data_pad[prev_end] == 32)
                            & (w_start[nxt_i] == prev_end + 1)
                        )
                        ok = ok[good]
                    if not len(ok):
                        continue
                    s = w_start[ok]
                    e = w_end[ok + len(toks) - 1]
                    cand_s.append(s)
                    cand_e.append(e)
                    cand_p.append(np.full(len(s), pid, dtype=np.int64))

    # rule-4 end-aligned candidates (byte-probe per doc, ~shapes x docs)
    ea_s, ea_e, ea_p = [], [], []
    for di, t in enumerate(texts):
        base = doc_starts[di]
        for cand in gaz._end_aligned(t, len(t), doc_lens[di]):
            s, e, pid = cand
            ea_s.append(base + s)
            ea_e.append(base + e)
            ea_p.append(pid)
    if ea_s:
        cand_s.append(np.asarray(ea_s, dtype=np.int64))
        cand_e.append(np.asarray(ea_e, dtype=np.int64))
        cand_p.append(np.asarray(ea_p, dtype=np.int64))

    if not cand_s:
        return (np.empty(0, np.int64),) * 4
    S = np.concatenate(cand_s)
    E = np.concatenate(cand_e)
    P = np.concatenate(cand_p)

    # dedup exact (mega_s, pid) — E is a function of (S, pid), so a single
    # packed int64 key suffices (S < 2^40 mega bytes, pid < 2^23)
    n_pids = len(gaz.names)
    key = S * n_pids + P
    _, keep = np.unique(key, return_index=True)
    S, E, P = S[keep], E[keep], P[keep]

    # boundary rules 1-6, vectorized (ASCII: after == next char position)
    doc_idx = np.searchsorted(doc_starts, S, side="right") - 1
    s_rel = S - doc_starts[doc_idx]
    e_rel = E - doc_starts[doc_idx]
    dlen = doc_lens[doc_idx]
    data_pad = np.append(data, np.uint8(_SENT))
    prev = np.where(s_rel > 0, data_pad[np.maximum(S - 1, 0)], np.uint8(_SENT))
    nxt = np.where(e_rel < dlen, data_pad[np.minimum(E, n)], np.uint8(_SENT))
    wsp, pup = LUT_WS[prev], LUT_PU[prev]
    wsn, pun = LUT_WS[nxt], LUT_PU[nxt]
    at0 = s_rel == 0
    r123 = (at0 | wsp | pup) & (wsn | pun)  # rules 1-3 (prev at s==0 fails LUTs)
    r4 = e_rel == dlen
    r5 = (pup | wsp) & wsn
    r6 = (pup | wsp) & pun & (nxt != _DOT) & (~at0) & (prev != _DOT)
    accept = r123 | r4 | r5 | r6
    # rule 1 requires s==0 AND boundary-next; at0 with alnum next must not
    # slip through r123 — it cannot: (wsn|pun) is False there.

    S, E, P, doc_idx = S[accept], E[accept], P[accept], doc_idx[accept]
    s_rel, e_rel = s_rel[accept], e_rel[accept]

    # reference ordering: (start, end, label) per doc
    order = np.lexsort((gaz.label_ranks[P], e_rel, s_rel, doc_idx))
    return doc_idx[order], s_rel[order], e_rel[order], P[order]
