from .formats import (
    save_annotations,
    write_brat,
    write_conll,
    write_csv,
    write_jsonl,
    write_spacy,
)

__all__ = [
    "save_annotations",
    "write_brat",
    "write_conll",
    "write_csv",
    "write_jsonl",
    "write_spacy",
]
