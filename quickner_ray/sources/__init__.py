from .csv_sources import read_entities_csv, read_excludes_csv, read_texts_csv
from .pages import read_pages, synth_pages_table, write_synth_pages

__all__ = [
    "read_entities_csv",
    "read_excludes_csv",
    "read_texts_csv",
    "read_pages",
    "synth_pages_table",
    "write_synth_pages",
]
