"""Flagship job in its deployment form: spark-submit --py-files.

    spark-submit --master local[4] \
        --py-files dist/quad_processor_util_spark.zip \
        tools/submit_job.py /root/testdata/sf0.001

The script imports ONLY pyspark + the shipped package (no repo-root
imports, no sys.path games) — exactly what a multi-executor cluster
launch looks like; the master comes from the spark-submit command line,
never from code. Prints one line: SUBMIT_RESULT {"turns": N, "quads": M}.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main(sf_dir: str) -> None:
    spark = SparkSession.builder.appName("quad-processor-util-spark").getOrCreate()
    # package import AFTER the session exists proves the zip shipped via
    # --py-files is what serves the import on driver and executors alike
    from quad_processor_util_spark.demo import events_to_transcripts, flagship_quads

    n_turns = events_to_transcripts(spark, sf_dir).count()
    n_quads = flagship_quads(spark, sf_dir).count()
    print("SUBMIT_RESULT " + json.dumps({"turns": n_turns, "quads": n_quads}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
