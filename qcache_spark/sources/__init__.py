from .files import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_orc,
    write_parquet,
)
from .ingest import (
    apply_stand_in_columns,
    from_csv,
    from_json_records,
    parse_stand_in_header,
    rows_to_csv,
    rows_to_json,
    to_csv,
    to_json_records,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_parquet",
    "write_parquet",
    "apply_stand_in_columns",
    "from_csv",
    "from_json_records",
    "parse_stand_in_header",
    "rows_to_csv",
    "rows_to_json",
    "to_csv",
    "to_json_records",
]
