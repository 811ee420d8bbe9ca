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
