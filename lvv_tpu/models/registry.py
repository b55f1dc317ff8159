"""Detector registry + builder.

Re-design of the reference's registry pattern (pcdet's public interface:
detectors/__init__.py:19-38 `__all__` dict + build_detector; model topology
assembled by Detector3DTemplate.build_networks from YAML). Here a detector
is a flax module built from the typed config; new families register with a
decorator.
"""
from __future__ import annotations

from typing import Callable, Dict

DETECTORS: Dict[str, Callable] = {}


def register_detector(name: str):
    def deco(fn):
        DETECTORS[name] = fn
        return fn
    return deco


@register_detector("VoxelNeXt")
def _build_voxelnext(det_cfg, vox_cfg):
    from .voxelnext import VoxelNeXtDetector
    return VoxelNeXtDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("PointPillars")
def _build_pointpillars(det_cfg, vox_cfg):
    from .pointpillars import PointPillarsDetector
    return PointPillarsDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("CenterPoint")
def _build_centerpoint(det_cfg, vox_cfg):
    from .centerpoint import CenterPointDetector
    return CenterPointDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("SECOND")
def _build_second(det_cfg, vox_cfg):
    from .second import SECONDDetector
    return SECONDDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("PVRCNN")
def _build_pvrcnn(det_cfg, vox_cfg):
    from .pv_rcnn import PVRCNNDetector
    return PVRCNNDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("PointRCNN")
def _build_pointrcnn(det_cfg, vox_cfg):
    from .point_rcnn import PointRCNNDetector
    return PointRCNNDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("DSVT")
def _build_dsvt(det_cfg, vox_cfg):
    from .dsvt import DSVTDetector
    return DSVTDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("BEVFusion")
def _build_bevfusion(det_cfg, vox_cfg):
    from .bevfusion import BEVFusionDetector
    return BEVFusionDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("PartA2")
def _build_parta2(det_cfg, vox_cfg):
    from .part_a2 import PartA2Detector
    return PartA2Detector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("SECONDNetIoU")
def _build_second_iou(det_cfg, vox_cfg):
    from .second_iou import SECONDNetIoUDetector
    return SECONDNetIoUDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("PillarNet")
def _build_pillarnet(det_cfg, vox_cfg):
    from .pillarnet import PillarNetDetector
    return PillarNetDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("PVRCNNPlusPlus")
def _build_pvrcnn_pp(det_cfg, vox_cfg):
    from .pv_rcnn_pp import PVRCNNPlusPlusDetector
    return PVRCNNPlusPlusDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("CaDDN")
def _build_caddn(det_cfg, vox_cfg):
    from .caddn import CaDDNDetector
    return CaDDNDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("VoxelRCNN")
def _build_voxelrcnn(det_cfg, vox_cfg):
    from .voxel_rcnn import VoxelRCNNDetector
    return VoxelRCNNDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("TransFusion")
def _build_transfusion(det_cfg, vox_cfg):
    from .transfusion import TransFusionDetector
    return TransFusionDetector(det_cfg=det_cfg, vox_cfg=vox_cfg)


@register_detector("MPPNet")
def _build_mppnet(det_cfg, vox_cfg):
    """Offline multi-frame refinement (reference detectors/mppnet.py):
    consumes a fixed T-frame point stack + first-stage proposals
    (reference MPPNet trains on pre-computed CenterPoint proposals)."""
    from .mppnet import MPPNetDetector
    return MPPNetDetector(det_cfg=det_cfg)


@register_detector("MPPNetE2E")
def _build_mppnet_e2e(det_cfg, vox_cfg):
    """Online variant with an explicit rolling memory bank
    (reference detectors/mppnet_e2e.py + mppnet_memory_bank_e2e.py)."""
    from .mppnet import MPPNetE2E
    return MPPNetE2E(det_cfg=det_cfg)


def build_detector(name: str, det_cfg, vox_cfg):
    if name not in DETECTORS:
        raise KeyError(f"unknown detector {name!r}; "
                       f"registered: {sorted(DETECTORS)}")
    return DETECTORS[name](det_cfg, vox_cfg)
