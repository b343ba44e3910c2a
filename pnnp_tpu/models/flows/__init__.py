from pnnp_tpu.models.flows.base import Bijector, sum_except_batch
from pnnp_tpu.models.flows.conv1x1 import InvertibleConv1x1
from pnnp_tpu.models.flows.coupling import (
    AffineCoupling,
    AffineCouplingV2,
    ShiftAndLogScale,
    ShiftAndLogScaleV2,
)
from pnnp_tpu.models.flows.sdn import SignalDependantISO, SignalDependantNS, GainISO
from pnnp_tpu.models.flows.basic import (
    ActNorm,
    actnorm_data_init,
    Squeeze,
    Logit,
    UniformDequantization,
    NoiseExtraction,
)
from pnnp_tpu.models.flows.conditional import (
    ConditionalAffineCoupling,
    ConditionalAffine,
    ConditionalLinear,
    ConditionalInvertibleConv1x1,
    SdnModelScale,
)
from pnnp_tpu.models.flows.spline import (
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)
