from . import (  # noqa: F401
    aggregates,
    cleaning,
    dedup,
    filters,
    joins,
    multimodal,
    quality,
    similarity,
    sets,
    sorting,
    windows,
)
