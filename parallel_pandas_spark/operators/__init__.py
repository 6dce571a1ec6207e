from . import (  # noqa: F401
    dedup,
    elementwise,
    grouped,
    joins,
    multimodal,
    ordered,
    reductions,
    similarity,
    text,
    windows,
)
