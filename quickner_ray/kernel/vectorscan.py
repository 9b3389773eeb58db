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

WIDE (non-ASCII text) variant: ``wide=True`` runs the identical scan over
UTF-32 codepoints (``np.frombuffer(text.encode('utf-32-le'), uint32)`` —
array index == char index), with codepoint LUTs for the boundary classes
(Rust ``char::is_whitespace`` is bounded at U+3000; ``is_ascii_punctuation``
at '~', so a 0x3002-entry LUT is exact) and word keys masked to 8-bit
first/last codepoints (collisions resolved by the existing exact verify).
4 bytes/char of bandwidth instead of 1, paid only for the non-ASCII docs
of a batch.

NON-ASCII NAMES are vectorized too, reproducing the reference's
byte-vs-char quirks per pattern (boundary.py): ``target_len`` is the
name's BYTE length, so for a non-ASCII name the rule-5/6 ``after``
position ``start + target_len`` lies BEYOND the span end and the
reference can accept spans that end MID-WORD ('東京' inside '東京irn ').
The scan therefore uses word-PREFIX candidates for the last token of
non-ASCII patterns (``_prefix_candidates``), evaluates ``after`` via a
per-candidate gather at ``start + byte_lens[pid]``, and rule 4 compares
``start + byte_lens[pid]`` against the doc's UTF-8 byte length. For
all-ASCII gazetteers (``all_ascii``) this collapses back to
``after == nxt`` and ``end == doc_len`` with zero extra work.
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

# codepoint LUTs for the wide (UTF-32) path. Rust char::is_whitespace's
# highest member is U+3000 IDEOGRAPHIC SPACE (chars.py pins the set), so
# every codepoint above _LUT_LIMIT maps to the extra all-False entry.
_LUT_LIMIT = 0x3001
LUT32_WS = np.zeros(_LUT_LIMIT + 1, dtype=bool)
for _c in RUST_WHITESPACE:
    LUT32_WS[ord(_c)] = True
LUT32_PU = np.zeros(_LUT_LIMIT + 1, dtype=bool)
for _c in ASCII_PUNCT:
    LUT32_PU[ord(_c)] = True
LUT32_BOUND = LUT32_WS | LUT32_PU


def _lut32(lut: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """LUT lookup over uint32 codepoints. ``take(mode='clip')`` maps every
    codepoint above the limit onto the all-False sentinel entry with no
    temporary array."""
    return lut.take(codes, mode="clip")


_BOUNDARY_ANY = RUST_WHITESPACE | ASCII_PUNCT


def is_token_name(name: str) -> bool:
    """True if ``name`` is a single-space-joined sequence of non-empty
    tokens containing no boundary-class chars (the vectorizable shape).
    Non-ASCII tokens are vectorizable too: the scan compares codepoints,
    and the byte-vs-char rule quirks are handled per pattern via
    ``byte_lens`` (see ``scan_batch_arrays``)."""
    if not name:
        return False
    toks = name.split(" ")
    if any(t == "" for t in toks):
        return False
    return not any(ch in _BOUNDARY_ANY for t in toks for ch in t)


def compile_token_patterns(names: list[str]) -> dict | None:
    """Pattern structures for the vector path, or None if ANY name is not
    token-shaped (caller falls back to the regex path entirely).

    ``first_keys``/``key_groups`` let the scan probe ALL first tokens with
    ONE searchsorted pass over the batch's word keys — patterns whose first
    token is absent from the batch (the overwhelming majority for a 10^5-name
    gazetteer) cost nothing.
    """
    by_first: dict[str, list[tuple[tuple[str, ...], int, bool]]] = {}
    prefix_singles: list[tuple[str, int]] = []
    for pid, name in enumerate(names):
        if not is_token_name(name):
            return None
        toks = tuple(name.split(" "))
        # non-ASCII name => target_len (BYTE length) > char length, so the
        # reference's rule-5/6 ``after`` position lies BEYOND the span end
        # and a span may be accepted mid-word (e.g. '東京' inside '東京irn '
        # when the char 4 past the start is a space). The last token then
        # needs PREFIX matching, not word equality; single-token such
        # patterns bypass the word-equality key probe entirely.
        pref = not name.isascii()
        if pref and len(toks) == 1:
            prefix_singles.append((toks[0], pid))
        else:
            by_first.setdefault(toks[0], []).append((toks, pid, pref))
    key_to_toks: dict[int, list[str]] = {}
    for tok in by_first:
        key_to_toks.setdefault(_token_key(tok), []).append(tok)
    first_keys = np.array(sorted(key_to_toks), dtype=np.int64)
    key_groups = [key_to_toks[int(k)] for k in first_keys]
    all_ascii = all(n.isascii() for n in names)
    byte_lens = np.fromiter(
        (len(n.encode("utf-8")) for n in names), dtype=np.int64, count=len(names)
    )
    # prefix singles grouped by FIRST CODEPOINT: the scan sorts the batch's
    # word-start codepoints once, then each group is a searchsorted range —
    # pattern count does not multiply the scan cost (mirrors first_keys for
    # the word-equality patterns; a 50k-name CJK gazetteer must not pay
    # 50k x n_words per batch)
    pg_map: dict[int, list[tuple[str, int]]] = {}
    for tok, pid in prefix_singles:
        pg_map.setdefault(ord(tok[0]), []).append((tok, pid))
    pg_cps = np.array(sorted(pg_map), dtype=np.int64)
    return {
        "by_first": by_first,
        "first_keys": first_keys,
        "key_groups": key_groups,
        "prefix_cps": pg_cps,
        "prefix_groups": [pg_map[int(c)] for c in pg_cps],
        "all_ascii": all_ascii,
        "byte_lens": byte_lens,
    }


# Per-process grow-only scratch buffers. Fresh large numpy allocations are
# the WORST-scaling primitive on an overcommitted host (page-fault zeroing
# does not parallelize; measured 0.71 efficiency 8->32 procs vs 0.88 for
# L2-resident ALU work) — reusing arenas across batches removes that traffic
# entirely. Each Ray worker process has its own arena; memory is bounded by
# the largest batch seen (a few MB).
_ARENA: dict = {}


def _scratch(name: str, size: int, dtype=np.uint8) -> np.ndarray:
    buf = _ARENA.get(name)
    if buf is None or buf.size < size or buf.dtype != dtype:
        cap = 1 << max(12, int(size - 1).bit_length())
        buf = np.empty(cap, dtype)
        _ARENA[name] = buf
    return buf[:size]


def _word_segments(data: np.ndarray, wide: bool = False):
    """Word [start, end) offsets over the mega buffer (bytes when narrow,
    chars when wide). ``data`` MUST end with a boundary char (callers
    append a trailing separator) — that guarantee removes the
    trailing-word edge case and lets the whole segmentation run as one
    int8 diff + one nonzero pass instead of five boolean temporaries."""
    n = len(data)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    bnd = _scratch("seg_bnd", n, np.bool_)
    if wide:
        LUT32_BOUND.take(data, mode="clip", out=bnd)
    else:
        LUT_BOUND.take(data, out=bnd)
    b8 = bnd.view(np.int8)
    d = _scratch("seg_d", n - 1, np.int8)
    np.subtract(b8[1:], b8[:-1], out=d)
    nz = np.flatnonzero(d)
    sign = d[nz]
    w_start = nz[sign < 0] + 1
    w_end = nz[sign > 0] + 1  # exclusive
    if not b8[0]:  # first char starts a word
        w_start = np.concatenate([np.zeros(1, dtype=np.int64), w_start])
    return w_start, w_end


def _word_keys(data: np.ndarray, w_start: np.ndarray, w_end: np.ndarray) -> np.ndarray:
    """Packed per-word key (len, first unit, last unit, unit-sum) — a cheap
    vectorized word signature. Collisions are resolved by exact
    verification at CANDIDATE positions only (match-count work). On the
    wide path the first/last codepoints are masked to 8 bits so ASCII
    token keys (``_token_key``) stay comparable; a masked collision with a
    non-ASCII word is caught by the exact verify.

    Word sums come from ONE ``np.add.reduceat`` pass over the raw units
    (uint32 accumulate; interleaved [start_i, end_i) ranges) — ~1 byte/char
    of traffic instead of the previous uint32-cumsum's ~13 (cast write +
    cumsum read/write). The uint32 wraparound is exact for the masked
    24-bit key: 2^24 | 2^32. Requires every index < len(data), which the
    trailing-separator guarantee provides (w_end <= len-1)."""
    nw = len(w_start)
    if nw == 0:
        return np.empty(0, dtype=np.int64)
    idx = _scratch("wk_idx", 2 * nw, np.int64)
    idx[0::2] = w_start
    idx[1::2] = w_end
    wsum = (
        np.add.reduceat(data, idx, dtype=np.uint32)[0::2] & np.uint32(0xFFFFFF)
    ).astype(np.int64)
    wlen = w_end - w_start
    first = data[w_start].astype(np.int64) & 0xFF
    last = data[w_end - 1].astype(np.int64) & 0xFF
    return (wlen << 40) | (first << 32) | (last << 24) | wsum


def _token_key(tok: str) -> int:
    """Codepoint token key, format-compatible with ``_word_keys``: the len
    field is the token's CHAR length, first/last codepoints masked to 8
    bits, codepoint-sum masked to 24. For ASCII tokens this equals the
    byte-based key of narrow-path words; a masked collision is always
    resolved by the exact codepoint verify at candidates."""
    cps = [ord(c) for c in tok]
    return (
        (len(cps) << 40)
        | ((cps[0] & 0xFF) << 32)
        | ((cps[-1] & 0xFF) << 24)
        | (sum(cps) & 0xFFFFFF)
    )


def _tok_arr(tok: str) -> np.ndarray:
    return np.fromiter((ord(c) for c in tok), dtype=np.uint32, count=len(tok))


def _token_candidates(
    data: np.ndarray,
    w_start: np.ndarray,
    word_keys: np.ndarray,
    tok: str,
    cache: dict,
) -> np.ndarray:
    """Sorted word indices whose word == tok exactly (key filter + exact
    codepoint verify at candidates). Key length-field match guarantees the
    gather stays inside the word, so no out-of-bounds reads."""
    got = cache.get(tok)
    if got is not None:
        return got
    cand = np.flatnonzero(word_keys == _token_key(tok))
    if len(cand):
        L = len(tok)
        mat = data[w_start[cand][:, None] + np.arange(L, dtype=np.int64)[None, :]]
        cand = cand[(mat == _tok_arr(tok)[None, :]).all(axis=1)]
    cache[tok] = cand
    return cand


def _prefix_candidates(
    data: np.ndarray,
    w_start: np.ndarray,
    w_end: np.ndarray,
    tok: str,
    cache: dict,
) -> np.ndarray:
    """Sorted word indices whose word STARTS WITH ``tok`` (length >= tok).
    Needed for the last token of non-ASCII patterns, whose spans may end
    mid-word (rule-5/6 ``after`` quirk). First-codepoint prefilter keeps
    the exact verify to a small candidate set."""
    key = ("pref", tok)
    got = cache.get(key)
    if got is not None:
        return got
    L = len(tok)
    ta = _tok_arr(tok)
    sel = np.flatnonzero((w_end - w_start >= L) & (data[w_start] == ta[0]))
    if len(sel) and L > 1:
        mat = data[w_start[sel][:, None] + np.arange(L, dtype=np.int64)[None, :]]
        sel = sel[(mat == ta[None, :]).all(axis=1)]
    cache[key] = sel
    return sel


def scan_batch_arrays(gaz, texts: list[str], wide: bool = False):
    """Vector-path scan of (already case-normalized) texts.

    Returns accepted matches as numpy arrays ``(doc_idx, start, end, pid)``
    sorted by (doc, start, end, label-rank) with exact duplicates removed —
    the reference's output ordering. Caller guarantees:
    ``gaz.token_spec`` is not None, and all texts ASCII when ``wide`` is
    False. ``wide=True`` runs the same scan over UTF-32 codepoints for
    non-ASCII docs (see module docstring)."""
    n_docs = len(texts)
    if n_docs == 0:
        return (np.empty(0, np.int64),) * 4
    mega = "\n".join(texts)
    # copy into the arena with a TRAILING separator: segmentation and the
    # reduceat word keys then need no edge handling, and the two former
    # whole-array np.append copies (adjacency pad + rule sentinel pad)
    # disappear — every probe index stays < len(data).
    if wide:
        enc = np.frombuffer(mega.encode("utf-32-le"), dtype=np.uint32)
        data = _scratch("mega32", len(enc) + 1, np.uint32)
        data[:-1] = enc
        data[-1] = 10
    else:
        enc = np.frombuffer(mega.encode("ascii"), dtype=np.uint8)
        data = _scratch("mega8", len(enc) + 1, np.uint8)
        data[:-1] = enc
        data[-1] = 10
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
    doc_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=doc_starts[1:])
    doc_lens = lens  # char length of each doc
    if wide:
        # rule 4 compares against the doc's UTF-8 BYTE length
        from .chars import byte_len

        doc_blens = np.fromiter(
            (byte_len(t) for t in texts), dtype=np.int64, count=n_docs
        )
    else:
        doc_blens = doc_lens  # ASCII: byte length == char length

    def end_aligned(di: int):
        return gaz._end_aligned(texts[di], int(doc_lens[di]), int(doc_blens[di]))

    return _scan_core(
        gaz, data, doc_starts, doc_lens, doc_blens, wide, end_aligned
    )


def scan_batch_ascii_arrow(gaz, arr):
    """Arrow-native ASCII fast path: ``arr`` is a pyarrow string /
    large_string ARRAY (not chunked), no nulls, pure-ASCII value buffer,
    already case-normalized. The scan reads the Arrow value buffer
    directly — no ``to_pylist``, no per-text ``str`` objects, no join, no
    encode (the worst-scaling interpreter work at high core counts) —
    copying doc bytes once into the separator-interleaved arena. The only
    per-doc Python left is the bounded rule-4 tail probe (<= longest-name
    bytes per doc)."""
    import pyarrow as _pa

    n_docs = len(arr)
    if n_docs == 0:
        return (np.empty(0, np.int64),) * 4
    large = _pa.types.is_large_string(arr.type)
    osz = 8 if large else 4
    off = np.frombuffer(
        arr.buffers()[1],
        dtype=np.int64 if large else np.int32,
        count=n_docs + 1,
        offset=osz * arr.offset,
    ).astype(np.int64, copy=False)
    vals_buf = arr.buffers()[2]
    vals = (
        np.frombuffer(vals_buf, dtype=np.uint8)
        if vals_buf is not None
        else np.empty(0, np.uint8)
    )
    lens = off[1:] - off[:-1]
    total = int(lens.sum()) + n_docs  # content + one separator per doc
    data = _scratch("mega8", total, np.uint8)
    doc_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=doc_starts[1:])
    for i in range(n_docs):  # n_docs bounded memcpys
        s = doc_starts[i]
        e = s + lens[i]
        data[s:e] = vals[off[i] : off[i + 1]]
        data[e] = 10
    max_bl = gaz.max_end_bl

    def end_aligned(di: int):
        blen = int(lens[di])
        toff = blen - max_bl if blen > max_bl else 0
        st = int(doc_starts[di])
        tail = data[st + toff : st + blen].tobytes().decode("ascii")
        return gaz._end_aligned_tail(tail, toff, blen, blen)

    return _scan_core(
        gaz, data, doc_starts, lens, lens, False, end_aligned
    )


def _scan_core(gaz, data, doc_starts, doc_lens, doc_blens, wide, end_aligned):
    """Shared scan over a separator-interleaved (and separator-TERMINATED)
    unit buffer. ``data[doc_starts[i] : doc_starts[i] + doc_lens[i]]`` is
    doc i; ``end_aligned(di)`` yields the per-doc rule-4 candidates."""
    n_docs = len(doc_lens)
    n = len(data) - 1  # content length (excluding the trailing separator)

    w_start, w_end = _word_segments(data, wide)
    n_words = len(w_start)

    cand_s: list[np.ndarray] = []
    cand_e: list[np.ndarray] = []
    cand_p: list[np.ndarray] = []

    if n_words:
        word_keys = _word_keys(data, w_start, w_end)
        tok_cache: dict[str, np.ndarray] = {}
        member_cache: dict[str, np.ndarray] = {}
        spec = gaz.token_spec
        by_first = spec["by_first"]
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
                L = len(first_tok)
                mat = data[
                    w_start[members_g][:, None] + np.arange(L, dtype=np.int64)[None, :]
                ]
                base = members_g[(mat == _tok_arr(first_tok)[None, :]).all(axis=1)]
                base = np.sort(base)
                tok_cache[first_tok] = base
                if not len(base):
                    continue
                for toks, pid, pref in by_first[first_tok]:
                    ok = base
                    for j in range(1, len(toks)):
                        ok = ok[ok + j < n_words]  # the j-th next word must exist
                        if not len(ok):
                            break
                        tb = toks[j]
                        # non-ASCII patterns: the LAST token only needs to
                        # be a word prefix (span may end mid-word)
                        want_pref = pref and j == len(toks) - 1
                        mkey = ("prefm", tb) if want_pref else tb
                        member = member_cache.get(mkey)
                        if member is None:
                            member = np.zeros(n_words, dtype=bool)
                            idxs = (
                                _prefix_candidates(data, w_start, w_end, tb, tok_cache)
                                if want_pref
                                else _token_candidates(
                                    data, w_start, word_keys, tb, tok_cache
                                )
                            )
                            member[idxs] = True
                            member_cache[mkey] = member
                        nxt_i = ok + j
                        prev_end = w_end[nxt_i - 1]
                        # next word matches the token, separated by EXACTLY
                        # one char and it is a space (the pattern is literal)
                        good = (
                            member[nxt_i]
                            & (data[prev_end] == 32)
                            & (w_start[nxt_i] == prev_end + 1)
                        )
                        ok = ok[good]
                    if not len(ok):
                        continue
                    s = w_start[ok]
                    # span end = last token start + its char length (equals
                    # w_end for exact-word matches; shorter for prefix ones)
                    e = w_start[ok + len(toks) - 1] + len(toks[-1])
                    cand_s.append(s)
                    cand_e.append(e)
                    cand_p.append(np.full(len(s), pid, dtype=np.int64))
        pg_cps = spec["prefix_cps"]
        if len(pg_cps):
            w_first = data[w_start].astype(np.int64)
            order_w = np.argsort(w_first, kind="stable")
            wf_sorted = w_first[order_w]
            w_len = w_end - w_start
            for cp, group in zip(pg_cps.tolist(), spec["prefix_groups"]):
                lo = np.searchsorted(wf_sorted, cp)
                hi = np.searchsorted(wf_sorted, cp, side="right")
                if lo == hi:
                    continue
                cand0 = order_w[lo:hi]
                for tok, pid in group:
                    L = len(tok)
                    sel = cand0[w_len[cand0] >= L]
                    if len(sel) and L > 1:
                        mat = data[
                            w_start[sel][:, None] + np.arange(L, dtype=np.int64)[None, :]
                        ]
                        sel = sel[(mat == _tok_arr(tok)[None, :]).all(axis=1)]
                    if not len(sel):
                        continue
                    st = w_start[sel]
                    cand_s.append(st)
                    cand_e.append(st + L)
                    cand_p.append(np.full(len(st), pid, dtype=np.int64))

    # rule-4 end-aligned candidates (byte-probe per doc, ~shapes x docs)
    ea_s, ea_e, ea_p = [], [], []
    for di in range(n_docs):
        base = doc_starts[di]
        for cand in end_aligned(di):
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

    # boundary rules 1-6, vectorized. Names on this path are ASCII tokens,
    # so the reference's ``after`` position (start + name BYTE length,
    # boundary.py) is char position ``end`` — ``after == nxt`` — and the
    # only byte-vs-char rule left is rule 4's comparison against the doc's
    # BYTE length (== char length when the doc is ASCII).
    doc_idx = np.searchsorted(doc_starts, S, side="right") - 1
    s_rel = S - doc_starts[doc_idx]
    e_rel = E - doc_starts[doc_idx]
    dlen = doc_lens[doc_idx]
    sent = data.dtype.type(_SENT)
    # trailing separator => every probe index is already < len(data)
    prev = np.where(s_rel > 0, data[np.maximum(S - 1, 0)], sent)
    nxt = np.where(e_rel < dlen, data[np.minimum(E, n)], sent)
    if wide:
        wsp, pup = _lut32(LUT32_WS, prev), _lut32(LUT32_PU, prev)
        wsn, pun = _lut32(LUT32_WS, nxt), _lut32(LUT32_PU, nxt)
    else:
        wsp, pup = LUT_WS[prev], LUT_PU[prev]
        wsn, pun = LUT_WS[nxt], LUT_PU[nxt]
    at0 = s_rel == 0
    r123 = (at0 | wsp | pup) & (wsn | pun)  # rules 1-3 (prev at s==0 fails LUTs)
    if gaz.token_spec["all_ascii"]:
        # name byte length == span char length: after == nxt, and rule 4's
        # start + target_len reduces to end
        r4 = e_rel == doc_blens[doc_idx]
        wsa, pua, after = wsn, pun, nxt
    else:
        # the reference's byte-vs-char quirk per pattern: target_len is the
        # name's BYTE length used as a char offset (boundary.py)
        tl_rel = s_rel + gaz.token_spec["byte_lens"][P]
        r4 = tl_rel == doc_blens[doc_idx]
        after = np.where(
            tl_rel < dlen, data[np.minimum(doc_starts[doc_idx] + tl_rel, n)], sent
        )
        if wide:
            wsa, pua = _lut32(LUT32_WS, after), _lut32(LUT32_PU, after)
        else:
            wsa, pua = LUT_WS[after], LUT_PU[after]
    r5 = (pup | wsp) & wsa
    r6 = (pup | wsp) & pua & (after != _DOT) & (~at0) & (prev != _DOT)
    accept = r123 | r4 | r5 | r6
    # rule 1 requires s==0 AND boundary-next; at0 with alnum next must not
    # slip through r123 — it cannot: (wsn|pun) is False there.

    S, E, P, doc_idx = S[accept], E[accept], P[accept], doc_idx[accept]
    s_rel, e_rel = s_rel[accept], e_rel[accept]

    # reference ordering: (start, end, label) per doc
    order = np.lexsort((gaz.label_ranks[P], e_rel, s_rel, doc_idx))
    return doc_idx[order], s_rel[order], e_rel[order], P[order]
