from .explain import explain_str, has_broadcast_join, pushed_filters, read_schema_columns  # noqa: F401
