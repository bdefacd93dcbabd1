from .io import (
    SCHEMAS,
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_parquet,
)

__all__ = [
    "SCHEMAS",
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_jsonl",
    "write_csv",
    "write_jsonl",
    "write_parquet",
]
