from .io import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    read_testdata,
    register_testdata_views,
    write_csv,
    write_json,
    write_parquet,
)
