"""Character predicates replicating Rust ``char`` semantics used by the reference.

The reference's boundary rules (quickner-core/src/quickner.rs:118-233) call
``char::is_whitespace`` (Unicode White_Space property) and
``char::is_ascii_punctuation``. Python's ``str.isspace`` is a superset of
White_Space (it also accepts U+001C..U+001F), so we pin the exact sets here.
"""

from __future__ import annotations

import string

# Unicode White_Space property (what Rust char::is_whitespace accepts).
_WHITE_SPACE_CODEPOINTS = (
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
RUST_WHITESPACE: frozenset[str] = frozenset(chr(c) for c in _WHITE_SPACE_CODEPOINTS)

# Rust char::is_ascii_punctuation == the 32 chars of string.punctuation.
ASCII_PUNCT: frozenset[str] = frozenset(string.punctuation)

# Chars matched by Python's regex \s (with re.UNICODE) form a superset of
# RUST_WHITESPACE; a candidate found at a Python-\s boundary is re-validated
# with the exact predicates below, so the superset is safe for scanning.
BOUNDARY_CLASS_RE: str = "[\\s" + "".join("\\" + c for c in sorted(ASCII_PUNCT)) + "]"


def is_rust_whitespace(c: str) -> bool:
    return c in RUST_WHITESPACE


def is_ascii_punct(c: str) -> bool:
    return c in ASCII_PUNCT


def char_at(text: str, i: int, n_char: int) -> str:
    """``text.chars().nth(i).unwrap_or('N')`` — out-of-range (including the
    usize-underflow of ``nth(start - 1)`` at start==0, which yields None in
    Rust) maps to the alphanumeric placeholder 'N' that fails both
    whitespace and punctuation checks (quickner.rs:137-222)."""
    if 0 <= i < n_char:
        return text[i]
    return "N"


def byte_len(text: str) -> int:
    """Rust ``str::len`` (UTF-8 byte length). Lone surrogates cannot occur
    in Rust strings (or Arrow strings), so their byte length is our
    extension: surrogatepass (3 bytes each) keeps the per-doc matcher
    total instead of raising — the regex fallback path then handles any
    Python str."""
    if text.isascii():
        return len(text)
    try:
        return len(text.encode("utf-8"))
    except UnicodeEncodeError:
        return len(text.encode("utf-8", "surrogatepass"))
