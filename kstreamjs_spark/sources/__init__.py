"""Source/sink builders: Kafka (reference parity) and files (parquet et al).

The Kafka connector JAR (spark-sql-kafka) is not bundled with PySpark; the
builders degrade to clear errors when it is absent, and the option-mapping
logic (the part that encodes reference semantics) is pure and unit-tested
without a broker.
"""

from .kafka import (  # noqa: F401
    kafka_reader_options,
    kafka_writer_options,
    prepare_sink,
    read_stream,
)
