"""state_api adapter: the migration seam between applyInPandasWithState
(exercised everywhere in-container) and transformWithStateInPandas
(needs google.protobuf — cluster-only; that lane skips here)."""

from __future__ import annotations

import importlib.util
import inspect

import pytest

from riemann_spark.streaming import index_stream, stateful_ops
from riemann_spark.streaming.state_api import STATE_TABLE, apply_with_state


def test_state_table_covers_every_stateful_operator():
    """Every applyInPandasWithState-backed operator must document its
    state contract — the table a TWS migration preserves."""
    ops = [
        name
        for name, fn in inspect.getmembers(stateful_ops, inspect.isfunction)
        if name.startswith("streaming_")
    ]
    for name in ops:
        assert name in STATE_TABLE, f"{name} missing from STATE_TABLE"
    assert "index_stream (expire reaper)" in STATE_TABLE
    for name, row in STATE_TABLE.items():
        assert {"keys", "state", "timeout", "emission"} <= set(row), name


def test_all_call_sites_route_through_adapter():
    """No operator may call applyInPandasWithState directly — the
    adapter is the single seam the migration flips."""
    for mod in (stateful_ops, index_stream):
        src = inspect.getsource(mod)
        direct = [
            line
            for line in src.splitlines()
            if ".applyInPandasWithState(" in line
        ]
        assert not direct, f"direct call left in {mod.__name__}: {direct}"


def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (cluster-only)",
)
def test_tws_lane_smoke(spark, tmp_path):
    """Where protobuf exists: the SAME update fn must produce the same
    rows through the TWS shim as through the legacy API."""
    import uuid

    from riemann_spark.streaming.stateful_ops import streaming_changed
    from tests.test_streaming import _mk, _run_stream

    import riemann_spark.streaming.state_api as sa

    old = sa._tws_available
    sa._tws_available = lambda: True
    try:
        src, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
        import os

        os.makedirs(src)
        batches = [[_mk(0, "a", "x", metric=1.0, t=0.0, state="ok")],
                   [_mk(1, "a", "x", metric=2.0, t=1.0, state="critical")]]
        rows = _run_stream(
            spark, src, ckpt, lambda s: streaming_changed(s), f"tws_{uuid.uuid4().hex[:6]}",
            batches,
        )
        assert len(rows) >= 1
    finally:
        sa._tws_available = old


# ------------------------------------------- shim vs legacy (in-container)

class _FakeValueState:
    """TWS ValueState surface the shim maps onto."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.timers = []

    def registerTimer(self, ts):
        self.timers.append(int(ts))

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def listTimers(self):
        return list(self.timers)


class _FakeTimerValues:
    def __init__(self, now_ms=0, wm_ms=0):
        self._now, self._wm = now_ms, wm_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now

    def getCurrentWatermarkInMs(self):
        return self._wm


class _FakeLegacyState:
    """The applyInPandasWithState GroupState subset our operators use."""

    def __init__(self, now_ms=0):
        self._v = None
        self._now = now_ms
        self.hasTimedOut = False
        self.timeout_set_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def getCurrentProcessingTimeMs(self):
        return self._now

    def setTimeoutDuration(self, ms):
        self.timeout_set_ms = int(ms)


def _capture_update(monkeypatch, build):
    """Invoke an operator builder with apply_with_state stubbed out,
    returning the REAL update closure it registered."""
    import riemann_spark.streaming.stateful_ops as so

    cap = {}

    def fake_apply(sdf, keys, update, out_schema, state_schema, **kw):
        cap["update"] = update
        return sdf

    monkeypatch.setattr(so, "apply_with_state", fake_apply)
    build()
    return cap["update"]


def test_tws_shim_matches_legacy_for_streaming_ewma(monkeypatch):
    """The 1:1 GroupState→TWS mapping, executable without
    google.protobuf: the REAL streaming_ewma update fn produces
    identical emissions and identical final state through
    TwsGroupStateShim (over fake ValueState/handle/timers) as through
    the legacy GroupState surface — two batches, state carried."""
    import pandas as pd

    from riemann_spark.streaming.state_api import TwsGroupStateShim
    from riemann_spark.streaming.stateful_ops import streaming_ewma

    update = _capture_update(monkeypatch, lambda: streaming_ewma(None, 10.0))
    key = ("h1", "svc")
    b1 = pd.DataFrame({"event_id": [0, 1], "time": [0.0, 5.0], "metric": [1.0, 2.0]})
    b2 = pd.DataFrame({"event_id": [2], "time": [15.0], "metric": [4.0]})

    legacy = _FakeLegacyState()
    out_legacy = [
        df for batch in (b1, b2) for df in update(key, iter([batch.copy()]), legacy)
    ]

    vs, handle = _FakeValueState(), _FakeHandle()
    shim = TwsGroupStateShim(vs, handle, _FakeTimerValues())
    out_shim = [
        df for batch in (b1, b2) for df in update(key, iter([batch.copy()]), shim)
    ]

    assert len(out_legacy) == len(out_shim) == 2
    for a, b in zip(out_legacy, out_shim):
        pd.testing.assert_frame_equal(a, b)
    assert legacy.get == vs.get()  # identical checkpointed state


def test_tws_shim_timer_lane_streaming_coalesce(monkeypatch):
    """Timer surface through the shim with the REAL streaming_coalesce
    update fn: a data invocation arms exactly one processing-time
    timer (stale timers deleted), a timed-out invocation emits the
    snapshot row and re-arms; the 'expired' tombstone removes state."""
    import pandas as pd

    from riemann_spark.streaming.state_api import TwsGroupStateShim
    from riemann_spark.streaming.stateful_ops import streaming_coalesce

    update = _capture_update(monkeypatch, lambda: streaming_coalesce(None, 2.0))
    key = ("h1", "svc")
    vs, handle = _FakeValueState(), _FakeHandle()
    handle.timers = [111, 222]  # stale timers a re-arm must clear

    rows = pd.DataFrame(
        {"event_id": [0], "time": [1.0], "metric": [5.0], "state": ["ok"]}
    )
    out = list(update(key, iter([rows]), TwsGroupStateShim(vs, handle, _FakeTimerValues(1000))))
    assert out == []  # data invocations buffer, emission is timer-driven
    assert vs.exists() and vs.get()[:3] == ("ok", 5.0, 1.0)
    assert handle.listTimers() == [1000 + 2000]  # stale ones deleted

    # timer fires: snapshot emitted, deadline re-armed from 'now'
    shim = TwsGroupStateShim(vs, handle, _FakeTimerValues(3000), has_timed_out=True)
    out = list(update(key, iter(()), shim))
    assert len(out) == 1 and out[0].iloc[0]["metric"] == 5.0
    assert handle.listTimers() == [3000 + 2000]

    # expired tombstone: emitted once, then state removed
    vs.update(("expired", 5.0, 1.0, 0, 5000))
    shim = TwsGroupStateShim(vs, handle, _FakeTimerValues(5000), has_timed_out=True)
    out = list(update(key, iter(()), shim))
    assert len(out) == 1 and out[0].iloc[0]["state"] == "expired"
    assert not vs.exists()
