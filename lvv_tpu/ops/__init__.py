"""TPU op library — Pallas kernels and XLA-native formulations replacing the
reference's 7 CUDA extensions + spconv (SURVEY.md §2.3 table)."""
from .attention import (attention, attention_reference, decode_attention,
                        flash_attention)
from .boxes import (corners_bev, iou_3d, iou_aabb_bev, iou_bev, limit_period,
                    pairwise_overlap_bev)
from .image import (normalize_pm1, preprocess_camera_frame, preprocess_views,
                    resize_and_pad_to_square, resize_bilinear)
from .nms import multi_class_nms, nms, nms_axis_aligned
from .pool import (assign_points_to_boxes, bev_pool, points_in_rotated_boxes,
                   roiaware_pool3d, roipoint_pool3d)
from .sampling import (ball_query, farthest_point_sample, group_points, knn,
                       three_interpolate)
from .segment import (ingroup_inds, run_ranks_sorted, segment_max,
                      segment_mean, segment_sum, unique_with_inverse)
from .voxelize import VoxelGrid, Voxels, mean_vfe, voxelize, voxelize_mean
