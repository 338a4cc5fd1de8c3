"""Vectorized scalar UDFs exposing the converter to SQL users.

``html_to_md`` is the simple string->string surface (the reference's
``HTML2Markdown::convert``); the full span pipeline lives in
html2text_spark.pipeline.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..core.config import Config
from ..core.converter import convert


def html_to_md_udf(cfg: Optional[Config] = None):
    """Arrow-batched html->markdown UDF (one converter instance per row,
    batched transfer; never raises -- malformed rows yield empty string)."""
    cfg = cfg or Config()

    @pandas_udf(StringType())
    def html_to_md(html: pd.Series) -> pd.Series:
        def safe(value):
            if value is None:
                return None
            try:
                return convert(value, cfg)
            except Exception:
                return ""

        return html.map(safe)

    return html_to_md


def register_all(spark: SparkSession, cfg: Optional[Config] = None) -> None:
    spark.udf.register("html_to_md", html_to_md_udf(cfg))
