"""python -m trainers.trainer_predict_future — k-step single-shot training."""
import sys
from sd_video_gen_tpu.train.trainer import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--train_mode", "future"])
