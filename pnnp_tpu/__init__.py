"""pnnp_tpu — a TPU-native (JAX/XLA/Pallas) low-light RAW denoising framework.

A from-scratch rebuild of the capabilities of fenghansen/PNNP (arXiv:2310.09126):
physics-guided noise synthesis, SID-style UNet denoisers, NoiseFlow noise proxies,
and the SID/ELD/LRID training+evaluation harness — re-architected around
`jit`/`vmap`/`pjit`, stateless PRNG and a device-resident data path.

Layout convention: all device tensors are NHWC (TPU-native); the packed-Bayer
channel order is RGBG ``[R, G1, B, G2]`` matching the reference's
``pack_raw_bayer`` (reference: data_process/process.py:40-64).
"""

__version__ = "0.1.0"

from pnnp_tpu import ops, physics, models, train, parallel, data  # noqa: F401
