from pnnp_tpu.ops.bayer import (
    pack_bayer,
    unpack_bayer,
    bayer2rggb,
    rggb2bayer,
    bayer2rows,
    rows2bayer,
    raw2bayer,
    bayer2raw,
    bayer2gray,
    repair_bad_pixels,
)
from pnnp_tpu.ops.isp import (
    apply_gains,
    apply_ccms,
    gamma_compression,
    raw2lrgb,
    process,
    simple_isp,
    fast_isp,
    bilinear_demosaic,
)
from pnnp_tpu.ops.vst import vst, inverse_vst, inverse_vst_batch
from pnnp_tpu.ops.tukey import (
    tukeylambda_ppf,
    tukeylambda_cdf,
    tukeylambda_sample,
)
from pnnp_tpu.ops.metrics import psnr, ssim, quality_assess
from pnnp_tpu.ops.tiling import eval_crop, eval_merge, tiled_apply
from pnnp_tpu.ops.correct import illuminance_correct
from pnnp_tpu.ops.kld import (
    kl_div_norm,
    kl_div_norm_device,
    kl_div_3_data,
    quantile_loss,
    cdf_loss,
)
from pnnp_tpu.ops.filters import stdfilt, guided_filter, fast_guided_filter, row_denoise
