"""Source abstraction: the same events schema served as a batch scan,
a file-based stream (tests), a rate-source synthetic generator, or —
in production — Kafka (reference S1, SparkDynamoDBConsumer.java:73-80).

The engine's plans take DataFrames, so swapping a source never touches
a query (SURVEY.md §7.0 decision 1).
"""

from .events import EVENTS_SCHEMA, events_batch, events_file_stream, kafka_stream
from .generator import city_event_stream

__all__ = [
    "EVENTS_SCHEMA",
    "events_batch",
    "events_file_stream",
    "kafka_stream",
    "city_event_stream",
]
