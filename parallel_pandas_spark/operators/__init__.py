from . import (  # noqa: F401
    dedup,
    grouped,
    joins,
    multimodal,
    ordered,
    reductions,
    similarity,
    text,
    windows,
)
