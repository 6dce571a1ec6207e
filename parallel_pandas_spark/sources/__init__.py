from .loaders import (  # noqa: F401
    TABLES,
    from_pandas,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_orc,
    read_partitioned,
    register_views,
    write_partitioned,
)
from .shards import shard_manifest, write_shards  # noqa: F401
