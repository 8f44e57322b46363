from . import (  # noqa: F401
    cc,
    dedup,
    grouping,
    joins,
    linking,
    mapping,
    packing,
    quadfilter,
    sampling,
    scoring,
    similarity,
    sort,
)
