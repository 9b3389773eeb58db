"""Text/entity validity filters — port of the reference's ``Filters``.

Semantics from quickner-core/src/config.rs:86-189 and utils.rs:19-78:
reject empty; reject all-alphanumeric when ``alphanumeric``; reject any ASCII
punctuation when ``punctuation``; reject any ASCII digit when ``numbers``;
reject any char from the effective special set when ``special_characters``
(the 31-char builtin set minus ``accept_special_characters``,
config.rs:125-143); reject BYTE length outside [min_length, max_length]
(config.rs:180-185; note Rust ``text.len()`` is bytes).

``valid_mask`` is the vectorized Arrow form used inside ``map_batches``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .chars import ASCII_PUNCT, byte_len

# config.rs:127-130 — note this builtin set has 31 chars (no '!').
SPECIAL_CHARACTERS: frozenset[str] = frozenset(
    "@#$%^&*()-_=+[]{};:\"'<>,.?/\\|~`"
)

_PUNCT_RE = re.compile("[" + "".join("\\" + c for c in sorted(ASCII_PUNCT)) + "]")
_DIGIT_RE = re.compile("[0-9]")


@dataclass
class Filters:
    alphanumeric: bool = False
    case_sensitive: bool = False
    min_length: int = 0
    max_length: int = 1024
    punctuation: bool = False
    numbers: bool = False
    special_characters: bool = False
    accept_special_characters: str | None = None
    list_of_special_characters: frozenset[str] | None = field(default=None, repr=False)

    def set_special_characters(self) -> None:
        accept = set(self.accept_special_characters or "")
        self.list_of_special_characters = frozenset(SPECIAL_CHARACTERS - accept)

    def get_special_characters(self) -> frozenset[str]:
        if self.list_of_special_characters is None:
            self.set_special_characters()
        return self.list_of_special_characters  # type: ignore[return-value]

    def is_valid(self, text: str) -> bool:
        if not text:
            return False
        if self.alphanumeric and text.isalnum():
            return False
        if self.punctuation and _PUNCT_RE.search(text):
            return False
        if self.numbers and _DIGIT_RE.search(text):
            return False
        if self.special_characters:
            special = self.get_special_characters()
            if any(c in special for c in text):
                return False
        n_bytes = byte_len(text)
        if self.min_length >= 0 and n_bytes < self.min_length:
            return False
        if self.max_length >= 0 and n_bytes > self.max_length:
            return False
        return True

    # -- vectorized Arrow form ------------------------------------------------
    def valid_mask(self, texts):
        """pyarrow.ChunkedArray/Array[string] -> pyarrow.BooleanArray.

        Vectorized equivalent of ``is_valid`` for map_batches hot paths.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        mask = pc.greater(pc.utf8_length(texts), 0)
        if self.alphanumeric:
            mask = pc.and_(mask, pc.invert(pc.utf8_is_alnum(texts)))
        if self.punctuation:
            mask = pc.and_(
                mask, pc.invert(pc.match_substring_regex(texts, _PUNCT_RE.pattern))
            )
        if self.numbers:
            mask = pc.and_(mask, pc.invert(pc.match_substring_regex(texts, "[0-9]")))
        if self.special_characters:
            cls = "[" + "".join("\\" + c for c in sorted(self.get_special_characters())) + "]"
            mask = pc.and_(mask, pc.invert(pc.match_substring_regex(texts, cls)))
        nbytes = pc.binary_length(texts.cast(pa.binary()))
        if self.min_length >= 0:
            mask = pc.and_(mask, pc.greater_equal(nbytes, self.min_length))
        if self.max_length >= 0:
            mask = pc.and_(mask, pc.less_equal(nbytes, self.max_length))
        return mask
