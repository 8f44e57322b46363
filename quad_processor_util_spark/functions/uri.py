"""URI / IRI scalar functions as Arrow-vectorized pandas UDFs.

Each wraps the corresponding pure-Python oracle function so Spark-side and
test-side semantics are the same code (SURVEY.md Stage 2 parity stance).

Reference: wikiEncode utils/WikiUtil.scala:56-102; IRI minting
utils/UriUtils.scala:61-138; lenient decode uri/UriDecoder.java:41-102;
escapes utils/TurtleUtils.scala:51-140.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..oracle import (
    mint_dbpedia_iri,
    nt_escape,
    nt_unescape,
    percent_decode_lenient,
    wiki_encode,
)


@pandas_udf(StringType())
def mint_iri_udf(s: pd.Series) -> pd.Series:
    """Surface form -> canonical DBpedia-style IRI (UriUtils.scala:61-98)."""
    return s.map(lambda x: mint_dbpedia_iri(x) if isinstance(x, str) else None)


@pandas_udf(StringType())
def wiki_encode_udf(s: pd.Series) -> pd.Series:
    """wikiEncode (WikiUtil.scala:56-102)."""
    return s.map(lambda x: wiki_encode(x) if isinstance(x, str) else None)


@pandas_udf(StringType())
def percent_decode_udf(s: pd.Series) -> pd.Series:
    """Lenient %XX decode (UriDecoder.java:41-102)."""
    return s.map(lambda x: percent_decode_lenient(x) if isinstance(x, str) else None)


@pandas_udf(StringType())
def nt_escape_udf(s: pd.Series) -> pd.Series:
    """N-Triples escape incl. \\uXXXX (TurtleUtils.scala:100-140)."""
    return s.map(lambda x: nt_escape(x) if isinstance(x, str) else None)


@pandas_udf(StringType())
def nt_unescape_udf(s: pd.Series) -> pd.Series:
    """N-Triples unescape (TurtleUtils.scala:51-90)."""
    return s.map(lambda x: nt_unescape(x) if isinstance(x, str) else None)


def local_name(col: Column) -> Column:
    """IRI -> local name after the last '/', '#' or ':' — the namespace-split
    used for predicate file naming (ref: utils/RdfNamespace.scala:45-56,
    scripts/DumpSplitter.scala:49-57). Pure Catalyst."""
    return F.regexp_extract(col, r"([^/#:]+)$", 1)


def safe_partition_value(col: Column) -> Column:
    """Sanitize a predicate IRI into a filesystem-safe partition value
    (the `<nsPrefix>-<localName>` naming of DumpSplitter.scala:49-57)."""
    return F.regexp_replace(local_name(col), r"[^A-Za-z0-9_.-]", "_")
