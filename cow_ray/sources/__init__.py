from .jsonl import read_jsonl_with_row_ids  # noqa: F401
from .warc import read_warc_pages, write_warc_shards  # noqa: F401
from .parquet import (  # noqa: F401
    plan_row_groups,
    read_parquet_split,
    read_parquet_with_row_ids,
)
