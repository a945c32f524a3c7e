"""UST-RUN/TPU — a TPU-native rebuild of the UST-RUN semi-supervised,
domain-generalized 2D medical-image segmentation framework.

The reference (MQinghe/UST-RUN, PyTorch, single GPU) is rebuilt from scratch
for TPU: JAX/Flax/XLA for the compute path, with the entire training
algorithm (weak/strong augmentation, Fourier domain adaptation, CutMix,
teacher/student pseudo-labeling, curriculum queues, EMA, losses) compiled
into a single fused XLA step over a `jax.sharding.Mesh`.

Layout:
    config      — dataset profiles + CLI-compatible argument handling
    utils       — ramps, dice metrics, losses, boundary metrics, meters
    data        — manifest builders, host-side decode cache, prefetch pipeline
    ops         — device-side augmentations, FDA, CutMix, resampling
    models      — Flax model zoo (UNet, Unet2D/DSBN family, WRN, DeepLabV2)
    semisup     — the SSL algorithm as one jitted train step + train state
    parallel    — mesh construction and sharding specs
    engine      — trainer / evaluator / checkpointing
"""

__version__ = "0.1.0"
