"""cvpce_tpu — TPU-native planogram compliance evaluation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
laitalaj/cvpce (computer-vision based planogram compliance evaluation):

- GLN (Gaussian Layer Network): class-agnostic RetinaNet-style product
  detector with a Gaussian heatmap branch (reference:
  cvpce/models/proposals.py).
- DIHE (Domain-Invariant Hierarchical Embedding): MAC descriptor networks
  over VGG/ResNet trunks, trained with hierarchical triplet loss and a
  GAN domain adapter (reference: cvpce/models/classification.py,
  cvpce/classification_training.py).
- Planogram compliance: detection -> embedding kNN -> graph matching ->
  RANSAC homography -> compliance score (reference: cvpce/planograms.py,
  cvpce/production.py).

Everything on the compute path is jitted XLA with static shapes; data
parallelism is a `jax.sharding.Mesh` + `shard_map` with `psum` gradient
reduction (replacing the reference's DDP/NCCL); hot post-processing
(NMS, kNN, heatmap rendering) has Pallas kernels.
"""

__version__ = "0.1.0"
