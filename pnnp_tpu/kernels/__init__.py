"""Pallas TPU kernels for the serving fast path.

`s2d_chain` fuses the UNet's level-1 stacks in the exact 2x2-block s2d form.

History: an im2col conv3x3 kernel (exact, fused bias+LeakyReLU) lived here
through round 1; it stayed grid/VMEM-liveness-bound at ~12 ms/frame-equiv
vs XLA's ~2 ms and was removed — the winning strategy is not to beat XLA at
a single conv but to (a) change the representation so convs are 128-lane
dense (dense-s2d, models/unet_s2d.py) and (b) fuse the relayout-bound glue
around them in VMEM (s2d_chain).
"""

from pnnp_tpu.kernels.s2d_chain import (  # noqa: F401
    fused_head,
    fused_tail,
    head_weights,
    tail_weights,
)
