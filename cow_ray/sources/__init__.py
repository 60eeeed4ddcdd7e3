from .parquet import read_parquet_with_row_ids, plan_row_groups  # noqa: F401
