"""Model stack: SAM+CLIP DeepEncoder, VAT compressors, Qwen decoder, and the
end-to-end VQA assembly (SURVEY.md §2.1/§2.2 inventory)."""
from .clip import CLIPVisionTower
from .deepencoder import (CAM_VIEWS, FIXED_GRID_SIDE, FIXED_IMAGE_SIZE,
                          DeepEncoder, build_deepencoder)
from .layers import (MLP, Dense, LayerNorm, MultiHeadAttention, RMSNorm,
                     quick_gelu)
from .projector import MlpProjector, projector_flops_per_sample
from .qwen import (KVCache, QwenModel, cross_entropy_loss, init_cache)
from .sam import SAMImageEncoder
from .anchor_head import (AnchorHead, ResidualBoxCoder, anchor_head_loss,
                          assign_anchor_targets, decode_anchor_preds,
                          generate_anchors)
from .centerpoint import CenterPointDetector, height_compression
from .pointnet2 import (FeaturePropagation, PointNet2Backbone,
                        SetAbstraction, SetAbstractionMSG)
from .pointpillars import (BaseBEVBackbone, BaseBEVBackboneV1,
                           BaseBEVResBackbone, DenseCenterHead, PillarVFE,
                           PointPillarsDetector, pillar_scatter)
from .registry import DETECTORS, build_detector, register_detector
from .roi_head import (RoIHead, proposal_targets, refine_boxes,
                       roi_head_loss)
from .second import SECONDDetector
from .swin import SwinBackbone
from .vat import NUM_VIEWS, VATBlock, VATLiDAR, VATVision, VisionAdapter
from .voxelnext import (Detections, VoxelNeXtBackbone, VoxelNeXtDetector,
                        VoxelNeXtHead, decode_detections)
from .voxelnext_loss import assign_targets, voxelnext_loss
from .vqa import (VQABatch, VQAModel, encode_prefix_fn,
                  generate_from_prefix, greedy_generate,
                  greedy_generate_multi, prepare_serving_params,
                  prepare_serving_params_fused, sam_grid_side,
                  sample_generate)
