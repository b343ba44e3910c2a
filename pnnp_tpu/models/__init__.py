from pnnp_tpu.models.unet import UNetSeeInDark, DeepUNet, ResUNet, DeepResUNet
from pnnp_tpu.models.noise_flow import NoiseFlow
from pnnp_tpu.models.proxy import PixelWiseISOProxy
from pnnp_tpu.models.registry import build_model, register
from pnnp_tpu.models.convert import torch_state_to_flax, flax_to_torch_state, load_tolerant
from pnnp_tpu.models import flows
