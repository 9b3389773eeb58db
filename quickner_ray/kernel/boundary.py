"""Word-boundary acceptance rules — bug-compatible port of the reference.

Replicates ``find_index_using_aho_corasick``'s per-match acceptance logic
(quickner-core/src/quickner.rs:137-222) exactly, including its deliberate
quirks:

- ``start``/``end`` are CHAR indices on the (possibly lowercased) text, but
  ``target_len`` is the BYTE length of the entity name, and rule 4 compares
  ``start + target_len`` against the BYTE length of the text
  (quickner.rs:136, 180-183). Rules 5/6 index chars at ``start + target_len``
  (quickner.rs:196, 215-218). Equivalent to char arithmetic only for ASCII.
- Out-of-range char lookups (and the usize-underflow ``nth(start-1)`` at
  start == 0) yield the placeholder 'N' which fails both the whitespace and
  punctuation predicates.
- Rule 6 rejects a following '.' and a preceding '.', but rules 2/3 can still
  accept a match whose previous char is '.' (the ``www.rust-lang.org`` case).
"""

from __future__ import annotations

from .chars import ASCII_PUNCT, RUST_WHITESPACE, char_at


def accept(text: str, n_char: int, b_text: int, start: int, end: int, target_len: int) -> bool:
    """Return True iff the raw automaton match (char span ``start..end``, entity
    byte length ``target_len``) passes the reference's boundary rules 1-6.

    ``n_char`` = len(text) in chars, ``b_text`` = len(text) in UTF-8 bytes.
    """
    ws = RUST_WHITESPACE
    punct = ASCII_PUNCT
    nxt = char_at(text, end, n_char)
    nxt_is_ws = nxt in ws
    nxt_is_punct = nxt in punct
    # Rule 1 (quickner.rs:137-143)
    if start == 0 and (nxt_is_ws or nxt_is_punct):
        return True
    prev = char_at(text, start - 1, n_char) if start > 0 else "N"
    prev_is_ws = prev in ws
    prev_is_punct = prev in punct
    # Rule 2 (quickner.rs:148-162)
    if start > 0 and prev_is_ws and (nxt_is_ws or nxt_is_punct):
        return True
    # Rule 3 (quickner.rs:164-179)
    if start > 0 and prev_is_punct and (nxt_is_ws or nxt_is_punct):
        return True
    # Rule 4 (quickner.rs:180-183): byte-length arithmetic, unconditional.
    if start + target_len == b_text:
        return True
    after = char_at(text, start + target_len, n_char)
    # Rule 5 (quickner.rs:184-202)
    if (prev_is_punct or prev_is_ws) and after in ws:
        return True
    # Rule 6 (quickner.rs:203-222)
    if (
        (prev_is_punct or prev_is_ws)
        and after in punct
        and after != "."
        and (start > 0 and prev != ".")
    ):
        return True
    return False
