"""Source/sink registry.

The reference takes an injected reactive publisher (Kafka in production,
in-memory in tests — Base.java:77,94); sinks are Kafka topics and MongoDB
collections.  Spark equivalents are declared here so pipelines can be
wired to any of them without touching stage code.
"""

from .registry import read_source, write_sink  # noqa: F401
