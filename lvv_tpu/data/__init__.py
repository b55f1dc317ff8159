"""Data layer: nuScenes VQA dataset, collation, samplers, tokenizers."""
from .collate import Collator, load_views_u8, pack_text
from .dataset import (CAM_VIEWS, DeterministicSampler, MixedNuDataset,
                      index_bev_features, load_qa_rows, make_nusc_handle,
                      split_rows)
from .nuscenes_tables import TableNuScenes
from .prefetch import Prefetcher
from .tokenizer import (ByteTokenizer, HFTokenizer, format_prompt,
                        load_tokenizer)
