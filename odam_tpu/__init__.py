"""ODAM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for online object
detection, association, and mapping from posed RGB video.

Re-designed from scratch with the capabilities of likojack/ODAM
(reference layout documented in /root/repo/SURVEY.md):

- ``odam_tpu.utils``    — geometry / box / assignment primitives (pure JAX + host NumPy).
- ``odam_tpu.ops``      — compute kernels: fused attention, Sinkhorn, superquadric
                          surface sampling, batched LAP.
- ``odam_tpu.models``   — DETR 3D-aware detector and GNN associator (Flax).
- ``odam_tpu.mapping``  — multi-view superquadric/quadric optimization (vmapped).
- ``odam_tpu.data``     — ScanNet IO, transforms, datasets.
- ``odam_tpu.parallel`` — device-mesh / sharding helpers.
- ``odam_tpu.runtime``  — the online per-frame pipeline (OdamProcess equivalent).
- ``odam_tpu.eval``     — Scan2CAD F1 and detection-mAP protocols.
"""

__version__ = "0.1.0"
