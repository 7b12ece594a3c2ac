"""ccst_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of JeremyCJM/CCST ("Federated Domain Generalization for Image
Recognition via Cross-Client Style Transfer", WACV 2023).

Built from scratch for TPU: NHWC layouts, bfloat16 compute with float32
statistics, `pjit`/`shard_map` over device meshes, Pallas kernels for the
fused AdaIN stack, and Orbax checkpoints.

Subpackages
-----------
- ``ops``       core numerical ops (AdaIN statistics, image transforms, FFT aug)
- ``models``    VGG encoder / AdaIN decoder / classifier zoo (ResNet, DenseNet, ...)
- ``pipeline``  offline stylization pipeline (style banks, stylize, list generation)
- ``data``      txt-list datasets, host loaders, on-device preprocessing
- ``federated`` federated training runtime (FedAvg/FedBN/FedProx/AdaFea + DG plugins)
- ``parallel``  mesh construction, sharding helpers, spatial (halo) sharding
- ``kernels``   Pallas TPU kernels for the hot ops
- ``privacy``   style-statistic inversion analysis (reconstruction attack)
- ``utils``     metrics, checkpointing, PRNG helpers
"""

__version__ = "0.1.0"
