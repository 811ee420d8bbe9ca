"""Structured Streaming realization of the riemann semantics
(SURVEY.md §2.9, build plan Phase 4).

Batch is the semantics oracle; everything here reuses the operator
library's Column logic. What streaming adds:

- watermarks stand in for the reference's "too old, drop" branch
  (streams.clj:387-389) and the max-event-time horizon of
  moving-time-window (streams.clj:338);
- `applyInPandasWithState` replaces the reference's per-key heap state
  (index NonBlockingHashMap, coalesce table, by-forks) with
  checkpointed distributed state;
- event-time timers replace the reaper loop (core.clj:275-309);
- `Trigger.ProcessingTime` replaces the `every!` scheduler
  (time.clj:129-140).
"""

from riemann_spark.streaming.index_stream import streaming_index
from riemann_spark.streaming.ops import (
    streaming_rate,
    streaming_window_folds,
    with_event_timestamp,
)
from riemann_spark.streaming.stateful_ops import (
    streaming_batch,
    streaming_fill_in_last,
    streaming_coalesce,
    streaming_ewma,
    streaming_fixed_event_window,
    streaming_moving_event_window,
    streaming_top,
)
