"""panst3r_tpu — a TPU-native multi-view panoptic 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas implementation of the full PanSt3R pipeline
(multi-view consistent panoptic segmentation + pointmap reconstruction,
reference: naver/panst3r), redesigned TPU-first:

- MUSt3R-style ViT encoder/decoder with 2D RoPE and a fixed-capacity
  cross-view token memory (reference: must3r ext dep, /root/reference/src/panst3r/engine/must3r.py)
- Mask2Former-style open-vocabulary panoptic head with multi-view joint
  attention (reference: src/panst3r/model/mask_transformer.py)
- Pallas fused attention kernels replacing cuRoPE/xFormers CUDA paths
- SPMD scaling over jax.sharding meshes (data / memory-token axes) instead
  of torch DDP+NCCL (reference: train.py:227-230)
"""

__version__ = "0.1.0"
