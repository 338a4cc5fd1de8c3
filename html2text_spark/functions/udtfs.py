"""Python UDTF surface: explode one HTML document into span rows in SQL.

``html_spans(html)`` lets a pure-SQL user run the converter lateral-join
style::

    SELECT d.doc_id, s.kind, s.text, s.media_ref, s.offset
    FROM docs d, LATERAL html_spans(d.html) s

The heavy path remains the Arrow-batched ``pipeline.extract`` -- this is
the ergonomic SQL entry point (one converter call per row, rows fanned
out by the UDTF contract).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

from pyspark.sql import SparkSession

from ..core.config import Config
from ..core.converter import convert_spans


def make_html_spans_udtf(cfg: Optional[Config] = None):
    """Build the UDTF class (config captured in the closure)."""
    from pyspark.sql.functions import udtf

    cfg = cfg or Config()

    @udtf(returnType="kind: string, text: string, media_ref: string, offset: int")
    class HtmlSpans:
        def eval(self, html: Optional[str]) -> Iterator[Tuple]:
            """NULL input yields no rows; a document that fails
            conversion yields one kind='error' sentinel row (offset -1)
            instead of vanishing -- silent drop-on-error would make data
            loss undetectable from SQL results (the extract path surfaces
            the same condition as metrics.malformed)."""
            if html is None:
                return
            try:
                out = convert_spans([("html", html, "")], cfg)
            except Exception as exc:
                yield "error", type(exc).__name__, "", -1
                return
            for i, (kind, text, media) in enumerate(out):
                yield kind, text, media, i

    return HtmlSpans


def register_all(spark: SparkSession, cfg: Optional[Config] = None) -> None:
    spark.udtf.register("html_spans", make_html_spans_udtf(cfg))
