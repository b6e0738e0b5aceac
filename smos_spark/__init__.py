"""smos_spark — a from-scratch PySpark-native time-series rollup engine.

Re-expresses the capabilities of the reference TUW-GEO/smos
(image→time-series reformatting: scan, quality-flag masking, spatial
subsetting, gap-fill, the img2ts pivot, incremental append, per-point
read-back — see SURVEY.md) as an idiomatic Spark DataFrame engine over
a table of conversation transcripts:

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Core pipeline: value-null masking → per-conv regularization + gap-fill
→ 1m/1h/1d retention-tier continuous aggregates (partials that
re-aggregate exactly) → Gorilla XOR / delta-of-delta compressed series
→ checkpointed incremental appends with per-partition lineage.

Everything is DataFrame-first: Catalyst handles pruning/pushdown; the
only Python on the hot path is Arrow-vectorized pandas UDFs (codecs,
linear interpolation).
"""

__version__ = "0.1.0"

from smos_spark.session import get_spark  # noqa: F401
