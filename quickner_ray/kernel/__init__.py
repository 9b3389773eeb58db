"""Pure-Python conformance kernel (no Ray): matching, filters, hashing,
config, HTML extraction. See SURVEY.md §7.1."""

from .annotate import annotate_text, annotate_texts, naive_find_index
from .automaton import Gazetteer
from .boundary import accept
from .chars import ASCII_PUNCT, RUST_WHITESPACE, byte_len
from .config import Config
from .filters import SPECIAL_CHARACTERS, Filters
from .hashing import fnv1a_64, hash_text, hash_texts
from .htmlextract import extract_text, synth_page

__all__ = [
    "ASCII_PUNCT",
    "Config",
    "Filters",
    "Gazetteer",
    "RUST_WHITESPACE",
    "SPECIAL_CHARACTERS",
    "accept",
    "annotate_text",
    "annotate_texts",
    "byte_len",
    "extract_text",
    "fnv1a_64",
    "hash_text",
    "hash_texts",
    "naive_find_index",
    "synth_page",
]
