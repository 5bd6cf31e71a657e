from sd_video_gen_tpu.evaluation.fvd import (
    FeatureStats, frechet_distance, compute_fvd, get_fvd_logits,
    preprocess_videos,
)
