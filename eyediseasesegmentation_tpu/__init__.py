"""EyeDiseaseSegmentation-TPU — a TPU-native (JAX/XLA/Pallas/pjit) framework for
retinal fundus pathology segmentation.

Re-designed from scratch for TPU with the capability surface of the reference
PyTorch/Catalyst framework (duylebkHCM/EyeDiseaseSegmentation):

* IDRiD lesion segmentation (MA / HE / EX / SE) and retinal-vessel segmentation
  (DRIVE / CHASEDB1 / HRF).
* A model zoo registered under ``models.MODEL_REGISTRY`` (UNet family, UNet++ with
  deep supervision, the proposed UnetPlusPlusStar with an axial-attention BoT
  SE-ResNet50 encoder and cross-axial-attention skip gates, FPN, DeepLabV3+, ...).
* Compound weighted losses, optimizer/scheduler registries (incl. MADGRAD +
  Lookahead, ReduceLROnPlateau), deep supervision, early stopping.
* Single-pass batched TTA (d4/flip/multiscale/crops), on-device sliding-window
  tiled inference, multi-checkpoint ensembling.
* AUC-PR / AUC-ROC threshold-sweep analysis and per-image statistic CSVs.

TPU-first design notes
----------------------
* Layout is NHWC, params fp32, compute bfloat16 (``dtype`` policy per module).
* Augmentation is a pure function of a PRNG key, fused into the jitted train step
  (no host-side albumentations analogue in the hot loop).
* Parallelism is a ``jax.sharding.Mesh`` with a ``data`` axis (room for ``model``):
  batch sharded, params replicated, gradients psum'd by XLA.
* The axial-attention hot op has a fused Pallas TPU kernel for the eval/TTA path.
"""

__version__ = "0.1.0"
