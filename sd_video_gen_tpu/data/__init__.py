from sd_video_gen_tpu.data.frame_datasets import (
    BouncingBallDataset, KittiDataset, MovingMNISTDataset,
)
from sd_video_gen_tpu.data.pipeline import BatchLoader
from sd_video_gen_tpu.data.synthetic import generate_bouncing_ball_tree
