"""texteller_spark — PySpark-native web-page extraction engine.

Public API: the flagship extraction plans, the synthetic corpus source, the
session factory, and the training-data operators. Everything here is a
``pyspark.sql`` DataFrame transform (Arrow-batched kernels where Python is
unavoidable; zero per-row Python at the Spark level).
"""

from .plans.pipeline import (  # noqa: F401
    extract_pages,
    extract_pages_chunked,
    span_table,
)
from .session import build_session  # noqa: F401

__version__ = "0.2.0"

__all__ = [
    "build_session",
    "extract_pages",
    "extract_pages_chunked",
    "span_table",
    "__version__",
]
