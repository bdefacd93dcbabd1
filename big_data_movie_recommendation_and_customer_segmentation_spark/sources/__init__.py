from .io import SCHEMAS, TABLES, load_table, load_tables, read_csv, write_csv, write_parquet

__all__ = ["SCHEMAS", "TABLES", "load_table", "load_tables", "read_csv", "write_csv", "write_parquet"]
