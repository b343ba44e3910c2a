from pnnp_tpu.kernels.conv3x3 import conv3x3_bias_act, conv3x3_reference
