"""Driver-side collect of a SMALL (bounded-by-construction) Dataset.

Ray hash aggregates can emit zero-row blocks with an EMPTY schema;
``pa.concat_tables`` rejects them and a naive collect crashes or mistypes.
This is the one shared guard: fetch block refs, drop blocks that are empty
or lack the required column, and fall back to a caller-supplied typed empty
table.  Callers are size-gated paths (broadcast keysets, dimension-bounded
grids, gazetteer-bounded degree maps) — never use this on unbounded data.
"""

from __future__ import annotations

import pyarrow as pa


def collect_blocks(ds, required_col: str, empty: pa.Table) -> pa.Table:
    """Materialize ``ds`` driver-side as one combined Arrow table.

    ``required_col`` identifies real blocks (schema-less empties lack it);
    ``empty`` is returned — and fixes the schema — when nothing survives.
    """
    import ray

    blocks = [
        t
        for t in (ray.get(r) for r in ds.to_arrow_refs())
        if t.num_rows and required_col in t.column_names
    ]
    if not blocks:
        return empty
    return pa.concat_tables(blocks).combine_chunks()
