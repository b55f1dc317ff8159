"""lvv_tpu — a TPU-native LiDAR + multi-camera VQA framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Advaith-Sajeev/LiDAR-Vision-VQA (see SURVEY.md for the structural map of the
reference). The compute path is pure JAX (jit/pjit/shard_map over a
`jax.sharding.Mesh`), hot kernels are Pallas TPU kernels with XLA reference
fallbacks, and the host-side runtime (IO, point-cloud decoding) has a native
C++ layer under `native/`.

Subpackages
-----------
- ``lvv_tpu.ops``       TPU op library: flash attention, voxelization, sparse
                        conv (gather-GEMM-scatter), rotated IoU/NMS, BEV pool,
                        FPS/ball-query, on-device image preprocessing.
- ``lvv_tpu.models``    SAM-B / CLIP-L DeepEncoder, VAT query-compression
                        transformers, Qwen2.5 decoder with LoRA, VoxelNeXt.
- ``lvv_tpu.parallel``  Mesh construction, sharding rules, collectives.
- ``lvv_tpu.data``      nuScenes VQA dataset, collation, samplers.
- ``lvv_tpu.train``     Trainer, multi-group optimizer, checkpoints, metrics.
- ``lvv_tpu.inference`` Checkpoint loader + KV-cached generation engine.
- ``lvv_tpu.convert``   Torch/HF → JAX weight converters.
"""

__version__ = "0.1.0"
