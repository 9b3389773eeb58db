"""P1 validity filter as a vectorized Dataset stage."""

from __future__ import annotations

import pyarrow as pa

from ..kernel.filters import Filters


def filter_texts(ds, filters: Filters, text_col: str = "text"):
    """Apply the reference's Filters::is_valid predicate (config.rs:157-188)
    to a Dataset, vectorized via pyarrow.compute inside map_batches."""
    filters.set_special_characters()

    def _apply(batch: pa.Table) -> pa.Table:
        mask = filters.valid_mask(batch.column(text_col))
        return batch.filter(mask)

    return ds.map_batches(_apply, batch_format="pyarrow")
