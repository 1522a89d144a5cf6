"""Small Arrow helpers shared by stages."""

from __future__ import annotations

import pyarrow as pa


def ensure_schema(tb: pa.Table, schema: pa.Schema) -> pa.Table:
    """Ray's hash-join emits schema-less empty blocks for empty
    partitions; downstream joins then fail with 'No match for key
    field'. Coerce such blocks (and column order) to the expected
    schema."""
    if tb.num_rows == 0:
        return schema.empty_table()
    tb = tb.select(schema.names)
    if tb.schema != schema:
        tb = tb.cast(schema)
    return tb


def collect_arrow(ds, schema: pa.Schema) -> pa.Table:
    """Materialize a (small) Dataset result as one Arrow table with a
    guaranteed schema. Ray 2.49's ``Dataset.to_pandas()`` returns a
    column-less frame for zero-row datasets, which breaks downstream
    schema checks — use this for final, possibly-empty query results
    only (never mid-pipeline)."""
    import ray

    tables = [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
              for t in ray.get(ds.to_arrow_refs())]
    tables = [ensure_schema(t.select(schema.names), schema)
              for t in tables if t.num_rows > 0]
    if not tables:
        return schema.empty_table()
    return pa.concat_tables(tables)


def rename_drop(tb: pa.Table, renames: dict[str, str], drops: tuple[str, ...]) -> pa.Table:
    names = [renames.get(c, c) for c in tb.column_names]
    tb = tb.rename_columns(names)
    present = [c for c in drops if c in tb.column_names]
    return tb.drop_columns(present) if present else tb


def safe_coalesce(a, b):
    """``pc.coalesce`` with both inputs combined to a single chunk
    first. pyarrow 16.1.0's coalesce kernel mishandles validity bitmaps
    when its arguments have MISALIGNED chunk layouts (e.g. one 64-row
    chunk with nulls vs four 16-row chunks): re-slicing the bitmap
    leaks the masked-out garbage values through as if valid. Observed
    in situ (a null label coalesced to the searchsorted slot's raw
    value instead of the fallback column) and reproduced minimally in
    tests/test_functions.py::test_safe_coalesce_misaligned_chunks.
    Chunk layouts of a Ray batch's columns depend on block history, so
    EVERY coalesce of two table columns must go through here."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    return pc.coalesce(a, b)
