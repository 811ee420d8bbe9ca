"""riemann_spark — a PySpark-native event-stream analytics engine.

Re-expresses the capabilities of aphyr/riemann (reference at
/root/reference, see SURVEY.md) on Spark DataFrames / Structured
Streaming: the Event data model, the stream-composition operators, the
predicate query language, and the TTL-expiring latest-state index —
plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Batch DataFrames are the semantics oracle; streaming variants reuse the
same Column logic (SURVEY.md §7 Phase 0).
"""

from riemann_spark.schema import EVENT_SCHEMA, load_events, load_table, normalize_events
from riemann_spark.session import get_spark

__all__ = ["EVENT_SCHEMA", "load_events", "load_table", "normalize_events", "get_spark"]
__version__ = "0.1.0"
