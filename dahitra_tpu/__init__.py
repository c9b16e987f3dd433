"""DAHiTra-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for bitemporal
satellite change detection and building-damage assessment.

Re-designed from scratch for TPU with the capabilities of the reference
PyTorch repo nka77/DAHiTra (see SURVEY.md):

* LEVIR-CD binary change detection (2-class) and xBD damage assessment
  (5-class) pipelines.
* Model zoo: DAHiTra hierarchical-transformer UNet, BIT, siamese ResNet
  baselines, siamese UNets, ChangeFormer family.
* Single trainer/evaluator engine, on-device metrics, Orbax checkpoints,
  data-parallel + spatial-parallel sharding over a `jax.sharding.Mesh`.

Design stance (TPU-first):
  - NHWC layouts, bfloat16 matmul path, XLA fusion for elementwise chains.
  - No host round-trips in hot loops: augmentation, loss, and the confusion
    matrix all run on device.
  - Parallelism via GSPMD shardings (data + spatial axes), not replica
    scatter/gather.
"""

__version__ = "0.1.0"
