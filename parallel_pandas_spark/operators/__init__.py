from . import (  # noqa: F401
    dedup,
    elementwise,
    grouped,
    joins,
    kendall,
    multimodal,
    ordered,
    reductions,
    sampling,
    similarity,
    text,
    windows,
)
