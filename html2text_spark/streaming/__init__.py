from .ingest import streaming_extract

__all__ = ["streaming_extract"]
