"""utils/tracing.py: span accumulation, nesting, report rendering, and
the profiler wrapper's no-op path."""

import time

from masp_tpu.utils import tracing
from masp_tpu.utils.tracing import Tracer, device_profile


def test_spans_nest_and_accumulate():
    t = Tracer(enabled=True)
    for _ in range(3):
        with t.span("prove"):
            with t.span("msm"):
                time.sleep(0.001)
            with t.span("msm"):
                pass
    rows = t.rows()
    by_name = {name: (total, count, self_s) for _, name, total, count, self_s in rows}
    assert by_name["prove"][1] == 3
    assert by_name["msm"][1] == 6
    # parent total covers child total; self = total - children
    assert by_name["prove"][0] >= by_name["msm"][0]
    assert abs(by_name["prove"][2] - (by_name["prove"][0] - by_name["msm"][0])) < 1e-9
    depths = {name: depth for depth, name, *_ in rows}
    assert depths["prove"] == 0 and depths["msm"] == 1

    out = t.report()
    assert "prove" in out and "msm" in out


def test_disabled_tracer_records_nothing():
    t = Tracer(enabled=False)
    with t.span("x"):
        pass
    assert t.rows() == []
    assert "no spans" in t.report()


def test_module_tracer_reset_and_enable():
    tracing.enable(True)
    try:
        tracing.reset()
        with tracing.span("unit"):
            pass
        assert "unit" in tracing.report()
        tracing.reset()
        assert "no spans" in tracing.report()
    finally:
        tracing.enable(False)


def test_device_profile_noop_without_dir():
    with device_profile(None):
        pass
    with device_profile(""):
        pass
