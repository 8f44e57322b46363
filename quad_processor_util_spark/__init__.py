"""quad_processor_util_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of dbpedia/quad-processor-util.

Not a port: the reference's thread pools, hand-rolled external sort, and
file-concat machinery are replaced by Spark's DataFrame API, Catalyst, and
the shuffle. See SURVEY.md for the full structural analysis (file:line cites
into /root/reference).

Layout
------
- ``oracle``     pure-Python reference semantics (parser, escapes, IRI minting,
                 mention detection) shared by the vectorized UDFs and the tests.
- ``datagen``    deterministic synthetic transcripts / gazetteer / alias edges.
- ``functions``  vectorized scalar functions (NT parse/format, URI, text).
- ``operators``  dedup family, similarity search, salted join, connected
                 components, grouped star-view aggregation.
- ``plans``      the extract → link → canonicalize → materialize pipeline,
                 plus checkpoint ledger.
- ``sources``    table IO abstraction (parquet-dir mode; Iceberg-shaped API).
- ``streaming``  Structured Streaming ingest of transcripts.
"""

__version__ = "0.1.0"
