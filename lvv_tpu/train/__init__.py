"""Training subsystem: optimizer groups, checkpoints, metrics, trainer."""
from .checkpoints import CheckpointManager
from .metrics import (bleu4, caption_metrics, cider, extract_boxes,
                      extract_class, grounding_metrics, metrics_by_template)
from .optim import (count_by_group, group_labels, make_optimizer,
                    make_schedule, param_group, trainable_mask)
from .trainer import Trainer
