from pnnp_tpu.models.flows.base import Bijector, sum_except_batch
from pnnp_tpu.models.flows.conv1x1 import InvertibleConv1x1
from pnnp_tpu.models.flows.coupling import AffineCoupling, ShiftAndLogScale
from pnnp_tpu.models.flows.sdn import SignalDependantISO, GainISO
from pnnp_tpu.models.flows.basic import (
    ActNorm,
    actnorm_data_init,
    Squeeze,
    Logit,
    UniformDequantization,
    NoiseExtraction,
)
