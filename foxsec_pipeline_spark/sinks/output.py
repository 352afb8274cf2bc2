"""Output plane: composite sinks for alert streams.

Reference: `OutputOptions.compositeOutput` (`CompositeOutput.java:80-121`)
fans one alert stream out to file / BigQuery / Pub/Sub / SQS / iprepd.
Spark mapping: batch writers for bounded runs; `foreachBatch` for
streaming (each micro-batch fans out to all configured sinks with
exactly-once file semantics from the checkpoint).

External network sinks (iprepd HTTP, SQS, email/Slack) are pluggable
callables so tests inject collectors — the reference gates these
behind IO interfaces the same way (`IprepdIO.java`, `SqsIO.java`,
`alert/AlertSlack.java`).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..alert.model import alerts_to_json


@dataclass
class CompositeOutput:
    """Fan-out sink config (`CompositeOutput.java:80-121`)."""

    file_path: str | None = None
    # name -> callable(list[str]) receiving alert JSON lines; stands in
    # for pubsub/sqs/iprepd/slack emitters (network IO stubbed per
    # SURVEY §2.1 S11-S14)
    emitters: dict[str, Callable[[list[str]], None]] = field(default_factory=dict)
    # emitters run on EXECUTORS via foreachPartition by default: an
    # alert storm (the scenario this pipeline exists for) must not
    # funnel an unbounded micro-batch through the driver. Collector
    # emitters in tests set driver_emit=True to keep closure state
    # observable in-process.
    driver_emit: bool = False

    def write_batch(self, alerts: DataFrame) -> None:
        js = alerts_to_json(alerts)
        if self.file_path:
            js.write.mode("append").text(self.file_path)
        if self.emitters:
            if self.driver_emit:
                lines = [r.value for r in js.collect()]
                for emit in self.emitters.values():
                    emit(lines)
            else:
                emitters = list(self.emitters.values())

                def emit_partition(rows) -> None:
                    lines = [r.value for r in rows]
                    if lines:
                        for emit in emitters:
                            emit(lines)

                js.foreachPartition(emit_partition)

    def stream_writer(self, alerts: DataFrame, checkpoint: str, **options):
        """writeStream wiring via foreachBatch (exactly-once per sink
        that supports idempotent writes)."""

        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            self.write_batch(batch_df)

        return (
            alerts.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .options(**options)
        )


def violations_from_alerts(alerts: DataFrame) -> DataFrame:
    """Alert -> iprepd Violation projection (`Violation.java:23-87,344`):
    one violation per alert carrying the source address and a
    type-derived violation name."""
    return (
        alerts.where(F.col("metadata").getItem("source_address").isNotNull())
        .select(
            F.col("metadata").getItem("source_address").alias("object"),
            F.lit("ip").alias("type"),
            F.concat(F.lit("fxa:heavy_hitter_"), F.col("category")).alias("violation"),
            F.col("alert_id"),
        )
    )
