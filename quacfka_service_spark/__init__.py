"""quacfka_service_spark — a PySpark-native rebuild of the capabilities
of loicalleyne/quacfka-service (streaming protobuf ETL + hourly
analytics), extended with LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns, sessionization).

Reference: /root/reference (read-only snapshot); design: SURVEY.md.

Public API (the orchestrator-shaped surface, SURVEY.md §3.3):

    from quacfka_service_spark import Pipeline, KafkaConfig, get_spark

    spark = get_spark("my-app")
    handle = (
        Pipeline(spark)
        .source_kafka(KafkaConfig(seeds=[...], topic="bidreq"))
        .decode()                       # from_protobuf or wire fallback
        .sink_lake("/lake", "/ckpt")    # raw + norm + hourly agg
        .run()
    )
    ...
    handle.stop()
"""

from .session import get_spark, load_table, tables  # noqa: F401
from .sources.kafka import KafkaConfig  # noqa: F401
from .streaming.pipeline import Pipeline, PipelineHandle  # noqa: F401
