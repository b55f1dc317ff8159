"""Utils coverage: debug tracer, Tee, meters (reference
training-test/test_logging.py / test_utils.py analogues)."""
import io

import numpy as np

from lvv_tpu.utils import AverageMeter, DebugTracer, Tee


def test_tracer_off_is_silent():
    sink = io.StringIO()
    t = DebugTracer(level=0, sink=sink)
    t.shape("x", np.zeros((2, 3)), "mod")
    t.section("sec")
    t.start_timer("a")
    t.end_timer("a")
    assert sink.getvalue() == ""


def test_tracer_levels_and_filters():
    sink = io.StringIO()
    t = DebugTracer(level=2, modules={"keep"}, sink=sink)
    t.shape("x", np.zeros((2, 3)), "keep")
    t.shape("y", np.zeros((2, 3)), "drop")
    out = sink.getvalue()
    assert "keep:x" in out and "drop" not in out


def test_tracer_timer_and_counters():
    sink = io.StringIO()
    t = DebugTracer(level=1, sink=sink)
    t.start_timer("step")
    dt = t.end_timer("step")
    assert dt >= 0
    t.count("n", 3)
    t.count("n")
    assert t.counters["n"] == 4


def test_tee_captures(tmp_path):
    log = tmp_path / "x.log"
    stream = io.StringIO()
    tee = Tee(str(log), stream=stream)
    tee.write("hello\n")
    tee.flush()
    tee.close()
    assert log.read_text() == "hello\n"
    assert stream.getvalue() == "hello\n"


def test_average_meter():
    m = AverageMeter()
    for v in [1.0, 2.0, 3.0]:
        m.update(v)
    assert m.avg == 2.0 and m.val == 3.0
    m.update(10.0, n=7)
    assert abs(m.avg - (6 + 70) / 10) < 1e-9
