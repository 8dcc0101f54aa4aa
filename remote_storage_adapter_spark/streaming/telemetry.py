"""Streaming telemetry (SURVEY A9): received/sent counters per batch.

The reference exports Prometheus counters receivedSamples / sentSamples
/ failedSamples and a send-duration histogram (main.go:77-113,
main.go:396-406). Spark-side equivalents:

- ``df.observe(name, ...)`` on the streaming frame — aggregates
  computed inline with the batch (no extra pass),
- a ``StreamingQueryListener`` that reads ``observedMetrics`` off each
  progress event and accumulates process-lifetime totals (these are
  what a metrics endpoint would export).

Batch durations and row rates come for free on the same progress
events (``batchDuration``, ``numInputRows``).
"""

from __future__ import annotations

import threading
from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed_samples(samples: DataFrame, name: str = "ingest") -> DataFrame:
    """Attach received/sent observation to a (streaming) samples frame."""
    c = F.col("val")
    finite = (~F.isnan(c)) & (c > float("-inf")) & (c < float("inf"))
    return samples.observe(
        name,
        F.count(F.lit(1)).alias("received"),
        F.sum(finite.cast("long")).alias("sent"),
    )


class IngestMetricsListener(StreamingQueryListener):
    """Accumulates observed ingest counters across micro-batches."""

    def __init__(self, observation_name: str = "ingest") -> None:
        self._name = observation_name
        self._lock = threading.Lock()
        self.totals: Dict[str, int] = {"received": 0, "sent": 0, "batches": 0}

    # -- listener interface -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        row = event.progress.observedMetrics.get(self._name)
        if row is None:
            return
        with self._lock:
            self.totals["received"] += int(row["received"] or 0)
            self.totals["sent"] += int(row["sent"] or 0)
            self.totals["batches"] += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -----------------------------------------------------------------------
    @property
    def dropped(self) -> int:
        return self.totals["received"] - self.totals["sent"]
