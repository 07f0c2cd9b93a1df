from .ingest import (
    apply_stand_in_columns,
    from_csv,
    from_json_records,
    parse_stand_in_header,
    to_csv,
    to_json_records,
)

__all__ = [
    "apply_stand_in_columns",
    "from_csv",
    "from_json_records",
    "parse_stand_in_header",
    "to_csv",
    "to_json_records",
]
