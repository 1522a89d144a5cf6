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


def rename_drop(tb: pa.Table, renames: dict[str, str], drops: tuple[str, ...]) -> pa.Table:
    names = [renames.get(c, c) for c in tb.column_names]
    tb = tb.rename_columns(names)
    present = [c for c in drops if c in tb.column_names]
    return tb.drop_columns(present) if present else tb
