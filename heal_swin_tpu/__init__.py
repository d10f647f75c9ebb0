"""heal-swin-tpu: TPU-native (JAX/XLA/Pallas) framework with the capabilities of
JanEGerken/HEAL-SWIN — spherical (HEALPix) and flat SWIN-UNet vision transformers for
semantic segmentation and depth estimation on fisheye driving data."""

__version__ = "0.1.0"
