"""SQL-registrable scalar functions."""

from .udfs import html_to_md_udf, register_all

__all__ = ["html_to_md_udf", "register_all"]
