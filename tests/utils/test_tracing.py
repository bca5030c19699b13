"""Tracing/counters subsystem tests."""
import numpy as np

from smqtk_indexing_tpu.utils.tracing import COUNTERS, Counters, trace_span


def test_counters_basic():
    c = Counters()
    c.add("x")
    c.add("x", 2.5)
    assert c.get("x") == 3.5
    assert c.get("missing") == 0.0
    snap = c.snapshot()
    assert snap["x"] == 3.5
    c.reset()
    assert c.get("x") == 0.0


def test_trace_span_records():
    c_before = COUNTERS.get("span.unit-test.calls")
    with trace_span("unit-test"):
        pass
    assert COUNTERS.get("span.unit-test.calls") == c_before + 1
    assert COUNTERS.get("span.unit-test.seconds") >= 0.0


def test_query_counters_move():
    from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
    from smqtk_indexing_tpu.models.nn_index.flat import (
        FlatNearestNeighborsIndex,
    )
    rng = np.random.default_rng(0)
    elems = [DescriptorMemoryElement(j, rng.normal(size=8).astype(np.float32))
             for j in range(16)]
    i = FlatNearestNeighborsIndex()
    i.build_index(elems)
    before = COUNTERS.get("flat.queries")
    i.nn(elems[0], 2)
    assert COUNTERS.get("flat.queries") == before + 1


def test_progress_reporter_contract():
    from smqtk_indexing_tpu.utils.progress_reporter import ProgressReporter
    import pytest
    calls = []
    pr = ProgressReporter(lambda *a: calls.append(a), interval=0.0)
    with pytest.raises(RuntimeError):
        pr.increment_report()  # must start() first
    pr.start()
    for _ in range(3):
        pr.increment_report()
    pr.report()
    assert calls  # rate lines were emitted
    # Thread-safe variant shares the counter.
    pr.increment_report_threadsafe()
