from . import cc, dedup, grouping, joins, linking, similarity  # noqa: F401
