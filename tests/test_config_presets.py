"""Every shipped preset loads into the typed config and names a real
detector family (reference ships 67 YAMLs under tools/cfgs/; the preset
library mirrors the per-dataset model tiers)."""
import glob
import os

import pytest

from lvv_tpu import config as C
from lvv_tpu.models.registry import DETECTORS, build_detector

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = sorted(glob.glob(os.path.join(REPO, "configs", "*.json")))


def test_preset_library_is_nonempty():
    assert len(PRESETS) >= 60


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p)
                                               for p in PRESETS])
def test_preset_loads_and_builds(path):
    raw = C.load_file(path)
    cfg = C.from_dict(C.VQAConfig, raw)
    assert len(cfg.model.voxelnext.class_names) == \
        cfg.model.voxelnext.num_classes
    assert len(cfg.voxelize.point_range) == 6
    det_name = raw.get("_detector")
    if det_name is not None:
        assert det_name in DETECTORS, det_name
        det = build_detector(det_name, cfg.model.voxelnext, cfg.voxelize)
        assert det is not None


def test_dataset_bases_cover_all_suites():
    bases = {os.path.basename(p) for p in
             glob.glob(os.path.join(REPO, "configs", "_base_", "*.json"))}
    for suite in ("kitti", "nuscenes", "waymo", "once", "lyft",
                  "pandaset", "argo2", "custom"):
        assert f"{suite}.json" in bases
