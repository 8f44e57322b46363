from . import (  # noqa: F401
    cc,
    dedup,
    grouping,
    joins,
    linking,
    mapping,
    quadfilter,
    sampling,
    scoring,
    similarity,
    sort,
)
