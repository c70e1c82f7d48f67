"""quacfka_service_spark — a PySpark-native rebuild of the capabilities
of loicalleyne/quacfka-service (streaming protobuf ETL + hourly
analytics), extended with LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Reference: /root/reference (read-only snapshot); design: SURVEY.md.
"""

from .session import get_spark, tables  # noqa: F401
