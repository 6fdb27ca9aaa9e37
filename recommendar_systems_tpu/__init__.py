"""recommendar_systems_tpu — a TPU-native multimodal graph-recommender engine.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
MMRec-style reference (EXLYSHA/Recommendar-Systems): config-driven training
and full-catalog top-k evaluation of multimodal graph recommender models
(BPR/VBPR, the LightGCN family, BM3, FREEDOM, MGCN, LATTICE, SLMRec, LGMRec,
DualGNN/DRAGON/MENTOR, MMGCN, GRCN, MVGAE, PGL, and the SMORE spectral-fusion
family) on implicit-feedback datasets with frozen image/text features.

Unlike the single-GPU PyTorch reference, everything here is built TPU-first:

- static-shape padded COO/ELL adjacencies instead of scipy sparse,
- graph propagation as gather/segment-sum (XLA) with a Pallas kernel path,
- on-device PRNG negative sampling instead of Python rejection loops,
- sharded U x I full-catalog scoring with distributed top-k,
- user/item embedding tables row-shardable over a `jax.sharding.Mesh`,
- a pure-function jitted trainer (incl. both Mirror-Gradient flavors).
"""

__version__ = "0.1.0"
