from pnnp_tpu.physics import calibration
from pnnp_tpu.physics.calibration import CAMERA_REGRESSION, ISO_TABLES, LEGAL_ISO, HALF_CLIP
from pnnp_tpu.physics.sampling import (
    sample_params_max,
    sample_params,
    sony_k_from_iso,
    params_at_iso_regression,
)
from pnnp_tpu.physics.noise import (
    generate_noisy,
    generate_noisy_packed,
    sna,
    raw_wb_aug,
    get_aug_param,
    random_gains,
)
from pnnp_tpu.physics.hbr import HighBitRecovery
from pnnp_tpu.physics.darkshading import SonyDarkShading, PhoneDarkShading
from pnnp_tpu.physics import unprocess
