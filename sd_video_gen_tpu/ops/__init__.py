from sd_video_gen_tpu.ops.masks import causal_mask
from sd_video_gen_tpu.ops.losses import (
    mse_loss,
    l1_loss,
    gradient_difference_loss,
    bipatch_nce_loss,
    composite_loss,
    LossWeights,
)
