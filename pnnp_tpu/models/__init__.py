from pnnp_tpu.models.unet import UNetSeeInDark, DeepUNet, ResUNet, DeepResUNet
from pnnp_tpu.models.noise_flow import NoiseFlow
from pnnp_tpu.models.proxy import PixelWiseISOProxy
from pnnp_tpu.models.registry import build_model, register
from pnnp_tpu.models.convert import (
    torch_state_to_flax,
    flax_to_torch_state,
    load_tolerant,
    eld_checkpoint_to_flax,
)
from pnnp_tpu.models import blocks
from pnnp_tpu.models.unet_s2d import unet_s2d_forward, unet_s2d_forward_pre, transform_params
from pnnp_tpu.models.unet_s2d_int8 import build_int8_server
from pnnp_tpu.models import flows
