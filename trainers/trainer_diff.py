"""python -m trainers.trainer_diff — residual next-frame training."""
import sys
from sd_video_gen_tpu.train.trainer import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--train_mode", "diff"])
