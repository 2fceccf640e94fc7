"""Streaming drift monitor: per-window PSI against a static reference.

The batch drift gate (functions/drift.py) answers "is this candidate
corpus like the reference?" — this module answers it continuously:
each event-time window's bin distribution is scored against a static
reference distribution, so a pipeline can alarm on the first window
that drifts instead of after the next batch job.

Shape: the ONLY streaming state is the watermarked windowed count
aggregate (bounded by |windows in watermark| × |bins|). PSI itself is
computed per micro-batch in ``foreachBatch`` against a broadcast
reference — no stream-stream join, no unbounded state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .stateful import ensure_event_time


def windowed_bin_counts(
    events: DataFrame,
    bin_col: Column,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked per-window histogram: (window_start, bin, n).
    Works identically on batch frames (tests) and streams."""
    e = ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
    return (
        e.groupBy(F.window(F.col(ts_col), window).alias("w"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "bin", "n")
    )


def psi_against_reference(
    counts: DataFrame, reference: DataFrame, smooth: float = 0.5
) -> DataFrame:
    """Score per-window bin counts against a static reference
    distribution. ``reference`` is (bin, n_ref) with exact counts; the
    bin universe is the union of reference bins and observed bins (a
    full outer join per window), so mass appearing in never-before-seen
    bins is drift, not an error. Returns one row per (window, bin) with
    the smoothed PSI contribution — same math and rounding rationale as
    functions/drift.psi_bins.
    """
    windows = counts.select("window_start").distinct()
    ref_all = windows.crossJoin(F.broadcast(reference))
    joined = ref_all.join(
        counts, on=["window_start", "bin"], how="full_outer"
    ).select(
        "window_start",
        "bin",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
    )
    t = joined.groupBy("window_start").agg(
        F.sum("n").alias("tot"),
        F.sum("n_ref").alias("tot_ref"),
        F.count(F.lit(1)).alias("nbins"),
    )
    p_cur = (F.col("n") + F.lit(smooth)) / (
        F.col("tot") + F.lit(smooth) * F.col("nbins")
    )
    p_ref = (F.col("n_ref") + F.lit(smooth)) / (
        F.col("tot_ref") + F.lit(smooth) * F.col("nbins")
    )
    return joined.join(F.broadcast(t), on="window_start").select(
        "window_start",
        "bin",
        "n",
        "n_ref",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 12).alias(
            "psi_contrib"
        ),
    )


def run_drift_monitor(
    stream: DataFrame,
    reference: DataFrame,
    bin_col: Column,
    checkpoint: str,
    out_table: str = "drift_monitor",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
):
    """Wire the monitor end-to-end: windowed counts (streaming state)
    → per-batch PSI vs the broadcast reference → memory sink named
    ``out_table``. availableNow-friendly; returns the StreamingQuery.
    """
    counts = windowed_bin_counts(
        stream, bin_col, window=window, watermark=watermark, ts_col=ts_col
    )

    # foreachBatch gets full batch-API freedom: score the closed
    # windows against the broadcast reference and expose them as a
    # global temp view per epoch (a production deployment appends to a
    # table/topic in the same closure).
    def score_to_view(batch: DataFrame, epoch: int) -> None:
        scored = psi_against_reference(batch, reference)
        scored.createOrReplaceGlobalTempView(f"{out_table}_epoch_{epoch}")
        scored.count()  # force evaluation inside the batch

    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(score_to_view)
        .trigger(availableNow=True)
        .start()
    )
