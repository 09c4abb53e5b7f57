"""Structured Streaming surface: file-replay sources (so tests and the
correctness driver run without a Kafka broker), memory-sink runners, and
the Statistics listener giving parity with the reference's
`flushStatistics` (/root/reference/src/context.ts:39-52,218-222).
"""

from .replay import run_to_memory, stream_table  # noqa: F401
from .stats import Statistics, StatisticsListener  # noqa: F401
