from pnnp_tpu.utils.logging import log, AverageMeter, StepTimer
from pnnp_tpu.utils.profiling import fn_timer, print_fn_timers, reset_fn_timers, device_trace, annotate
from pnnp_tpu.utils.debugger import AlgoDebugger
