from pnnp_tpu.train.losses import (
    l1_loss,
    charbonnier_loss,
    unet_loss,
    unet_dpsv_loss,
    unet_dpsv_up_loss,
    psnr_loss,
)
from pnnp_tpu.train.flow_losses import epe_loss, ternary_loss, sobel_loss
from pnnp_tpu.train.schedules import cosine_warm_restart, multistep, build_lr_schedule
from pnnp_tpu.train.state import TrainState, create_train_state, apply_scaled_updates
from pnnp_tpu.train.steps import (
    make_train_step,
    make_eval_metrics_step,
    make_eval_step,
    make_raw_synth,
    make_raw_synth_packed,
    make_proxy_synth,
    make_mix_synth,
    identity_synth,
    pack_synth,
    clip_lr_hr,
    pad_to_multiple,
)
from pnnp_tpu.train.checkpoint import CheckpointManager, save_checkpoint, load_checkpoint, load_any
