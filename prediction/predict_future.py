"""python -m prediction.predict_future — single-shot k-frame prediction."""
import sys
from sd_video_gen_tpu.predict.predict import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--train_mode", "future"])
