"""spark-submit entrypoint for the extraction job.

html2text_spark/job.py uses package-relative imports, so it cannot be
handed to spark-submit as a bare script; this wrapper is the submittable
file:

    spark-submit --py-files html2text_spark.zip run_job.py \
        --input iceberg:warehouse.docs --output s3a://bucket/run1 \
        --buckets 4096

Locally, ``python3 -m html2text_spark.job`` is equivalent.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from html2text_spark.job import main

if __name__ == "__main__":
    sys.exit(main())
