"""Visualization helpers (pure-numpy half; rerun calls gated)."""
import numpy as np

from lvv_tpu.viz import normalize_box_convention
from lvv_tpu.viz.rerun_viz import filter_predictions


def test_centerpoint_convention_swap():
    b = np.array([[1, 2, 0, 2.0, 4.0, 1.5, 0.0]], np.float32)
    out = normalize_box_convention(b, "centerpoint")
    assert out[0, 3] == 4.0 and out[0, 4] == 2.0      # w/l swapped
    assert abs(out[0, 6] - np.pi / 2) < 1e-6           # yaw offset
    same = normalize_box_convention(b, "pcdet")
    np.testing.assert_array_equal(same, b)


def test_filter_predictions():
    boxes = np.array([[0, 0, 0, 1, 1, 1, 0],
                      [50, 0, 0, 1, 1, 1, 0],
                      [1, 1, 0, 1, 1, 1, 0]], np.float32)
    scores = np.array([0.9, 0.8, 0.2])
    labels = np.array([0, 1, 0])
    b, s, l = filter_predictions(boxes, scores, labels, score_thresh=0.5)
    assert len(b) == 2
    b, s, l = filter_predictions(boxes, scores, labels, max_radius=10)
    assert len(b) == 2
    b, s, l = filter_predictions(boxes, scores, labels, keep_labels=[0])
    assert len(b) == 2
    b, s, l = filter_predictions(boxes, scores, labels, top_k=1)
    assert len(b) == 1 and s[0] == 0.9


def test_stream_scene_over_tables(tmp_path, monkeypatch):
    """L5 scene streaming driven by the devkit-free table reader with a
    fake rerun backend (reference nusc_rerun_demo_noargs.py behavior:
    per-keyframe LIDAR points + camera jpgs on one timeline)."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_nuscenes_tables import _write_tables
    from lvv_tpu.data.nuscenes_tables import TableNuScenes
    from lvv_tpu.viz import rerun_viz as rv

    class FakeRR:
        def __init__(self):
            self.calls = []

        def init(self, *a, **k):
            self.calls.append(("init",))

        def save(self, path):
            self.calls.append(("save", path))

        def set_time_seconds(self, *a):
            pass

        def log(self, entity, obj):
            self.calls.append(("log", entity, type(obj).__name__))

        class Points3D:
            def __init__(self, pts):
                self.pts = pts

        class Boxes3D:
            def __init__(self, **k):
                self.k = k

        class EncodedImage:
            def __init__(self, path):
                self.path = path

        class Quaternion:
            def __init__(self, xyzw):
                self.xyzw = xyzw

    fake = FakeRR()
    monkeypatch.setattr(rv, "rr", fake)
    monkeypatch.setattr(rv, "RERUN_AVAILABLE", True)
    root = _write_tables(tmp_path)
    (root / "samples" / "CAM_FRONT").mkdir(parents=True)
    (root / "samples" / "CAM_FRONT" / "c1.jpg").write_bytes(b"\xff\xd8")
    nusc = TableNuScenes("v1.0-mini", str(root))
    n = rv.stream_scene(nusc, "scene-1", rrd_path=str(tmp_path / "o.rrd"),
                        cameras=("CAM_FRONT",), with_boxes=True)
    assert n == 2
    logged = [c for c in fake.calls if c[0] == "log"]
    # 2 keyframes x (points + boxes), 1 camera jpg (only samp-1 has one)
    assert sum(1 for c in logged if c[1].endswith("/points")) == 2
    assert sum(1 for c in logged if c[1].endswith("/boxes")) == 2
    assert sum(1 for c in logged if "CAM_FRONT" in c[1]) == 1
    assert ("save", str(tmp_path / "o.rrd")) in fake.calls
