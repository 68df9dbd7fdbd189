"""Layered Kafka client configuration assembly.

Mirrors the reference Factory's precedence chain
(Factory.kt:44-107; precedence tests FactoryTest.kt:112-263):

    defaults < shared file < shared overrides < per-client file
             < per-client overrides < forced

The forced layer preserves reference *semantics* (not tuning):
consumer ``isolation.level=read_committed``, ``auto.offset.reset=earliest``,
``enable.auto.commit=false`` (Factory.kt:47-48,76); producer ``acks=all``,
``enable.idempotence=true`` (Factory.kt:85-86).

Spark's Kafka source/sink takes these as ``kafka.``-prefixed options.
"""

from __future__ import annotations

import configparser
import io
from pathlib import Path

CONSUMER_FORCED = {
    "isolation.level": "read_committed",
    "auto.offset.reset": "earliest",
    "enable.auto.commit": "false",
}
PRODUCER_FORCED = {
    "acks": "all",
    "enable.idempotence": "true",
}


def _read_properties(path: str | Path | None) -> dict[str, str]:
    """Parse a java-style .properties file (key=value lines)."""
    if path is None:
        return {}
    text = Path(path).read_text()
    parser = configparser.ConfigParser(interpolation=None)
    parser.optionxform = str  # keys are case-sensitive
    parser.read_string("[kafka]\n" + text)
    return dict(parser.items("kafka"))


def assemble_client_config(
    kind: str,
    shared_file: str | None = None,
    shared_overrides: dict[str, str] | None = None,
    client_file: str | None = None,
    client_overrides: dict[str, str] | None = None,
    defaults: dict[str, str] | None = None,
) -> dict[str, str]:
    """Merge config layers in reference precedence order; returns the flat
    client property map (lowest first, later layers win)."""
    if kind not in ("consumer", "producer"):
        raise ValueError(f"kind must be consumer|producer, got {kind!r}")
    merged: dict[str, str] = {}
    for layer in (
        defaults or {},
        _read_properties(shared_file),
        shared_overrides or {},
        _read_properties(client_file),
        client_overrides or {},
        CONSUMER_FORCED if kind == "consumer" else PRODUCER_FORCED,
    ):
        merged.update(layer)
    return merged


def as_spark_kafka_options(client_config: dict[str, str]) -> dict[str, str]:
    """Prefix client properties for Spark's Kafka source/sink options."""
    return {f"kafka.{k}": v for k, v in client_config.items()}


def render_properties(config: dict[str, str]) -> str:
    buf = io.StringIO()
    for k, v in sorted(config.items()):
        buf.write(f"{k}={v}\n")
    return buf.getvalue()
