"""Gazetteer matching engine — replaces the reference's Aho-Corasick automaton.

The reference compiles entity names into an ``aho_corasick::AhoCorasick``
(MatchKind::Standard) shared across rayon threads and enumerates ALL
overlapping raw matches per document, each filtered by the boundary rules
(quickner-core/src/quickner.rs:118-233, 253-289).

We exploit a provable property of those rules: a raw match can only be
ACCEPTED when (a) it starts at char 0 or right after a whitespace/ASCII-punct
char (rules 1-3, 5, 6 all require that), or (b) its char start plus the entity
name's BYTE length equals the text's BYTE length (rule 4). So instead of a
full Aho-Corasick scan we:

1. run ONE compiled regex over the batch's concatenated text that anchors at
   boundary positions and captures the longest trie path (the regex is a
   trie-structured alternation, so the C regex engine does the automaton
   walk);
2. walk the dict-trie over the captured span to recover every prefix pattern
   (overlapping matches, e.g. "Sun" inside "Sun Microsystems");
3. separately enumerate rule-4 byte-end-aligned candidates per text from the
   small set of distinct (byte_len, char_len) name shapes;
4. filter everything through the exact boundary rules (boundary.py).

``all_overlapping`` provides the brute-force oracle (a trie walk from every
position — exactly ``find_overlapping_iter`` semantics) used by property
tests to prove the fast path equivalent.

The compiled ``Gazetteer`` is picklable and is intended to be shipped to Ray
actors once via ``ray.put`` (built in the actor's ``__init__``, never per
batch).
"""

from __future__ import annotations

import re
import sys
from bisect import bisect_right
from collections.abc import Iterable

from .boundary import accept
from .chars import BOUNDARY_CLASS_RE, byte_len

_OUT = 0  # sentinel trie key for terminal pattern ids (never collides with 1-char str keys)

Span = tuple[int, int, str]


class Gazetteer:
    """Compiled gazetteer: dedup'd (name, label) patterns + trie + scan regex.

    Mirrors the reference's entity load semantics: with case_sensitive=False
    names are lowercased before dedup (quickner.rs:447-456, 506-509); empty
    names are dropped; (name, label) pairs are set-deduped (entity.rs:15-26)
    preserving first-occurrence order for determinism.
    """

    def __init__(self, entities: Iterable[tuple[str, str]], case_sensitive: bool = False):
        self.case_sensitive = case_sensitive
        names: list[str] = []
        labels: list[str] = []
        seen: set[tuple[str, str]] = set()
        for name, label in entities:
            if not case_sensitive:
                name = name.lower()
            if not name:
                continue
            key = (name, label)
            if key in seen:
                continue
            seen.add(key)
            names.append(name)
            labels.append(label)
        self.names = names
        self.labels = labels
        self.byte_lens = [byte_len(n) for n in names]
        # trie: nested dicts keyed by char; _OUT -> list of pattern ids
        trie: dict = {}
        for pid, name in enumerate(names):
            node = trie
            for ch in name:
                nxt = node.get(ch)
                if nxt is None:
                    nxt = {}
                    node[ch] = nxt
                node = nxt
            node.setdefault(_OUT, []).append(pid)
        self.trie = trie
        # (byte_len, char_len) -> {name: [pids]} for rule-4 end-aligned candidates
        self.len_pairs: dict[tuple[int, int], dict[str, list[int]]] = {}
        for pid, name in enumerate(names):
            d = self.len_pairs.setdefault((self.byte_lens[pid], len(name)), {})
            d.setdefault(name, []).append(pid)
        # longest name byte length: every rule-4 probe lies within the last
        # max_end_bl chars of an ASCII doc (s = b_text - bl >= b_text - max)
        self.max_end_bl = max((bl for bl, _cl in self.len_pairs), default=0)
        # batch concatenation uses '\n' as separator; unsafe if a name contains it
        self.sep_safe = not any("\n" in n for n in names)
        self._scan_re: re.Pattern | None = None
        # vector fast path (kernel/vectorscan.py): compiled token patterns
        # (None when any name isn't a plain word sequence) + label ranks so
        # numpy lexsort reproduces (start, end, label) string ordering
        from .vectorscan import compile_token_patterns

        self.token_spec = compile_token_patterns(names) if names else None
        import numpy as _np

        if labels:
            order = {l: i for i, l in enumerate(sorted(set(labels)))}
            self.label_ranks = _np.array([order[l] for l in labels], dtype=_np.int64)
        else:
            self.label_ranks = _np.empty(0, dtype=_np.int64)
        # surface-form -> ((end_offset, pid), ...) terminal memo. Web text is
        # Zipf-repetitive: the same few surfaces account for almost all raw
        # matches, so the per-match trie walk collapses to one dict hit.
        self._walk_cache: dict[str, tuple] = {}

    # -- pickling: drop the compiled regex + caches, rebuild per process ------
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_scan_re"] = None
        state["_walk_cache"] = {}
        return state

    def __len__(self) -> int:
        return len(self.names)

    # -- regex compilation ----------------------------------------------------
    def _trie_regex_body(self) -> str:
        """Trie-structured alternation matching the longest pattern path.

        Terminal nodes make their child alternation optional, so greedy
        matching with backtracking ends the match at the deepest reachable
        terminal; prefix terminals are recovered by a trie walk afterwards.
        """
        max_depth = max((len(n) for n in self.names), default=0)
        if max_depth + 100 > sys.getrecursionlimit():
            sys.setrecursionlimit(max_depth + 200)

        def emit(node: dict) -> str:
            terminal = _OUT in node
            children = sorted((k, v) for k, v in node.items() if k != _OUT)
            if not children:
                return ""
            alt = "|".join(re.escape(ch) + emit(sub) for ch, sub in children)
            return "(?:" + alt + ")" + ("?" if terminal else "")

        return emit(self.trie)

    def _get_scan_re(self) -> re.Pattern:
        if self._scan_re is None:
            body = self._trie_regex_body()
            # zero-width: anchored at a boundary position, capture the longest path
            self._scan_re = re.compile(
                "(?:\\A|(?<=" + BOUNDARY_CLASS_RE + "))(?=(" + body + "))"
            )
        return self._scan_re

    # -- candidate generation -------------------------------------------------
    def _walk_terminals(self, text: str, p: int, length: int, out: list[tuple[int, int, int]]):
        """Collect all terminal prefixes of text[p:p+length] as raw matches."""
        node = self.trie
        for i in range(length):
            node = node[text[p + i]]
            pids = node.get(_OUT)
            if pids is not None:
                e = p + i + 1
                for pid in pids:
                    out.append((p, e, pid))

    def _end_aligned(self, text: str, n_char: int, b_text: int) -> list[tuple[int, int, int]]:
        """Rule-4 candidates: raw matches with start_char + name_byte_len ==
        text_byte_len (quickner.rs:180-183). One probe per distinct
        (byte_len, char_len) name shape."""
        out: list[tuple[int, int, int]] = []
        for (bl, cl), by_name in self.len_pairs.items():
            s = b_text - bl
            if s < 0 or s + cl > n_char:
                continue
            pids = by_name.get(text[s : s + cl])
            if pids:
                e = s + cl
                for pid in pids:
                    out.append((s, e, pid))
        return out

    def _end_aligned_tail(
        self, tail: str, tail_off: int, n_char: int, b_text: int
    ) -> list[tuple[int, int, int]]:
        """Rule-4 candidates probed against only the doc's TAIL slice
        (``tail == text[tail_off:]``, ``tail_off >= n_char - max_end_bl``)
        — the Arrow scan path decodes just these <= max_end_bl chars per
        doc instead of materializing the whole text as a Python str."""
        out: list[tuple[int, int, int]] = []
        for (bl, cl), by_name in self.len_pairs.items():
            s = b_text - bl
            if s < 0 or s + cl > n_char:
                continue
            pids = by_name.get(tail[s - tail_off : s - tail_off + cl])
            if pids:
                e = s + cl
                for pid in pids:
                    out.append((s, e, pid))
        return out

    # -- public matching API --------------------------------------------------
    def annotate(self, text: str) -> list[Span]:
        """Annotate one (already case-normalized) text. Returns char-index
        spans ``(start, end, label)`` sorted by (start, end, label), exact
        duplicates removed — Document::annotate ordering (document.rs:83-96)."""
        return self.annotate_batch([text])[0]

    def _scan_arrays_mixed(self, texts: list[str]):
        """Vector-path scan of a mixed ASCII/non-ASCII batch: the narrow
        (uint8) kernel for the ASCII docs, the wide (UTF-32) kernel for the
        rest, results merged back into global doc order. Returns None when
        a text cannot be UTF-32-encoded (lone surrogates — caller falls
        back to the per-doc path). Caller guarantees token_spec is set."""
        import numpy as np

        from .vectorscan import scan_batch_arrays

        amask = [t.isascii() for t in texts]
        if all(amask):
            return scan_batch_arrays(self, texts)
        a_ids = np.flatnonzero(amask)
        w_ids = np.flatnonzero(~np.asarray(amask, dtype=bool))
        try:
            dw, sw, ew, pw = scan_batch_arrays(
                self, [texts[i] for i in w_ids], wide=True
            )
        except UnicodeEncodeError:
            return None
        if len(a_ids):
            da, sa, ea, pa = scan_batch_arrays(self, [texts[i] for i in a_ids])
        else:
            da = sa = ea = pa = np.empty(0, np.int64)
        doc_idx = np.concatenate([a_ids[da], w_ids[dw]])
        s = np.concatenate([sa, sw])
        e = np.concatenate([ea, ew])
        p = np.concatenate([pa, pw])
        # each half is already in reference order within its own docs and
        # doc sets are disjoint, so a stable sort on doc alone merges
        order = np.argsort(doc_idx, kind="stable")
        return doc_idx[order], s[order], e[order], p[order]

    def annotate_batch_arrays(self, texts: list[str]):
        """Accepted matches as numpy arrays ``(doc_idx, start, end, pid)``
        in reference order — ZERO per-mention Python on the vector fast
        path (token-shaped gazetteer; non-ASCII docs take the UTF-32 wide
        kernel); falls back to the regex path (converted to arrays)
        otherwise."""
        import numpy as np

        if self.token_spec is not None:
            arrs = self._scan_arrays_mixed(texts)
            if arrs is not None:
                return arrs
        spans = self._annotate_batch_impl(texts, with_pid=True)
        counts = [len(d) for d in spans]
        total = sum(counts)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        starts = np.empty(total, dtype=np.int64)
        ends = np.empty(total, dtype=np.int64)
        pids = np.empty(total, dtype=np.int64)
        i = 0
        for doc in spans:
            for s, e, pid in doc:
                starts[i] = s
                ends[i] = e
                pids[i] = pid
                i += 1
        return doc_idx, starts, ends, pids

    def annotate_batch_pids(self, texts: list[str]) -> list[list[tuple[int, int, int]]]:
        """Like ``annotate_batch`` but spans carry the PATTERN id instead of
        the label: ``(start, end, pid)``. For every accepted span,
        ``text[start:end] == self.names[pid]`` (the automaton matches the
        literal pattern), so downstream stages can materialize surfaces and
        per-pattern derived values (canonical entity ids) by table lookup
        with ZERO per-mention hashing/slicing. Ordering matches
        ``annotate_batch`` ((start, end, label) sort; (s,e,label) duplicates
        cannot arise from distinct pids — equal span => equal slice => equal
        name, and (name,label) pairs are deduped at build)."""
        return self._annotate_batch_impl(texts, with_pid=True)

    def annotate_batch(self, texts: list[str]) -> list[list[Span]]:
        """Annotate a batch of (already case-normalized) texts.

        One regex pass over the '\\n'-joined batch finds boundary-anchored
        candidates; per-text rule-4 probes add byte-end-aligned ones; the
        exact boundary rules filter; results match the reference per text.
        """
        return self._annotate_batch_impl(texts, with_pid=False)

    def _annotate_batch_impl(self, texts: list[str], with_pid: bool):
        n = len(texts)
        results: list[list] = [[] for _ in range(n)]
        if not self.names or n == 0:
            return results
        if self.token_spec is not None:
            # vector path throughout: narrow kernel for ASCII docs, wide
            # (UTF-32) kernel for the rest; per-doc regex only for
            # un-encodable texts (lone surrogates)
            arrs = self._scan_arrays_mixed(texts)
            if arrs is not None:
                doc_idx, starts, ends, pids = arrs
                labels = self.labels
                for di, s, e, pid in zip(
                    doc_idx.tolist(), starts.tolist(), ends.tolist(), pids.tolist()
                ):
                    results[di].append(
                        (s, e, pid) if with_pid else (s, e, labels[pid])
                    )
                return results
            return [self._annotate_single(t, with_pid) for t in texts]
        if not self.sep_safe:
            return [self._annotate_single(t, with_pid) for t in texts]
        mega = "\n".join(texts)
        starts = [0] * (n + 1)
        acc = 0
        for i, t in enumerate(texts):
            starts[i] = acc
            acc += len(t) + 1
        starts[n] = acc
        raw_per_doc: list[list[tuple[int, int, int]] | None] = [None] * n
        cache = self._walk_cache
        for m in self._get_scan_re().finditer(mega):
            p = m.start()
            length = m.end(1) - p
            surf = mega[p : p + length]
            hits = cache.get(surf)
            if hits is None:
                local: list[tuple[int, int, int]] = []
                self._walk_terminals(mega, p, length, local)
                hits = cache[surf] = tuple((e - p, pid) for _s, e, pid in local)
            di = bisect_right(starts, p) - 1
            raw = raw_per_doc[di]
            if raw is None:
                raw = raw_per_doc[di] = []
            rel = p - starts[di]
            for off, pid in hits:
                raw.append((rel, rel + off, pid))
        for di in range(n):
            results[di] = self._finish(texts[di], raw_per_doc[di] or [], with_pid)
        return results

    def _annotate_single(self, text: str, with_pid: bool = False) -> list:
        raw: list[tuple[int, int, int]] = []
        cache = self._walk_cache
        for m in self._get_scan_re().finditer(text):
            p = m.start()
            length = m.end(1) - p
            surf = text[p : p + length]
            hits = cache.get(surf)
            if hits is None:
                local: list[tuple[int, int, int]] = []
                self._walk_terminals(text, p, length, local)
                hits = cache[surf] = tuple((e - p, pid) for _s, e, pid in local)
            for off, pid in hits:
                raw.append((p, p + off, pid))
        return self._finish(text, raw, with_pid)

    def _finish(
        self, text: str, raw: list[tuple[int, int, int]], with_pid: bool = False
    ) -> list:
        n_char = len(text)
        b_text = byte_len(text)
        raw.extend(self._end_aligned(text, n_char, b_text))
        byte_lens = self.byte_lens
        labels = self.labels
        seen: set[tuple[int, int, int]] = set()
        # 4-tuples (s, e, label, pid): natural sort == reference (s, e, label)
        # ordering (pid is only compared when labels tie, which implies the
        # same (name, label) pair — impossible after build-time dedup).
        out: list[tuple[int, int, str, int]] = []
        # accept() depends only on this 5-tuple of local context (boundary.py
        # rules 1-6), so repeated contexts — the common case in web text —
        # skip the rule cascade entirely.
        accept_memo: dict[tuple, bool] = {}
        for cand in raw:
            if cand in seen:
                continue
            seen.add(cand)
            s, e, pid = cand
            bl = byte_lens[pid]
            tl = s + bl
            key = (
                s == 0,
                text[s - 1] if s > 0 else "",
                text[e] if e < n_char else "",
                tl == b_text,
                text[tl] if tl < n_char else "",
            )
            ok = accept_memo.get(key)
            if ok is None:
                ok = accept_memo[key] = accept(text, n_char, b_text, s, e, bl)
            if ok:
                out.append((s, e, labels[pid], pid))
        out.sort()
        # exact-duplicate removal (document.rs:88-96); duplicates only arise
        # from duplicate (name,label) pairs, which are dedup'd at build time
        dedup: list = []
        prev = None
        for s, e, label, pid in out:
            span = (s, e, label)
            if span != prev:
                dedup.append((s, e, pid) if with_pid else span)
                prev = span
        return dedup

    # -- oracle (test-only) ---------------------------------------------------
    def all_overlapping(self, text: str) -> list[tuple[int, int, int]]:
        """Brute-force ``find_overlapping_iter`` equivalent: trie walk from
        EVERY char position. O(n * max_name_len); test oracle only."""
        out: list[tuple[int, int, int]] = []
        n = len(text)
        trie = self.trie
        for p in range(n):
            node = trie
            i = p
            while i < n:
                node = node.get(text[i])
                if node is None:
                    break
                i += 1
                pids = node.get(_OUT)
                if pids is not None:
                    for pid in pids:
                        out.append((p, i, pid))
        out.sort()
        return out

    def annotate_oracle(self, text: str) -> list[Span]:
        """Reference-shaped annotate via the brute-force oracle scan."""
        return self._finish(text, self.all_overlapping(text))
