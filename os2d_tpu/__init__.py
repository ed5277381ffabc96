"""os2d_tpu: a TPU-native (JAX/XLA/Pallas) one-shot object detection framework.

Re-implements the full capability surface of the OS2D reference (aosokin/os2d,
ECCV 2020) as an idiomatic JAX framework: functional model core, static shapes,
vmapped class/scale axes, on-device decoding + NMS, and pjit/shard_map
parallelism over TPU meshes.
"""

__version__ = "0.1.0"
