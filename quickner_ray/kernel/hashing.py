"""Stable content hashing for document identity.

The reference derives a document id as the hex of Rust's ``DefaultHasher``
(SipHash) over the text (quickner-core/src/utils.rs:95-102, document.rs:37).
That hasher is not stable across Rust releases, so matching its *values* is
explicitly out of the conformance contract (SURVEY.md §1.2); matching its
*semantics* — identical text ⇒ identical id, dedup by content — is. We use
MD5 hex: stable across processes/nodes/runs and reproducible in DuckDB via
``md5(text)`` for oracle checks.
"""

from __future__ import annotations

import hashlib


def hash_text(text: str) -> str:
    """Stable 128-bit content hash (hex) of the UTF-8 bytes of ``text``."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def hash_texts(texts) -> list[str]:
    """Vectorized-ish batch variant (the md5 core is C)."""
    md5 = hashlib.md5
    return [md5(t.encode("utf-8")).hexdigest() for t in texts]


def fnv1a_64(data: bytes) -> int:
    """FNV-1a 64-bit — cheap deterministic hash for salting/bucketing keys."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
