"""python -m prediction.predict_text — text-conditioned prediction; use
evaluation.predict_fvd --train_mode text for the online-FVD variant."""
import sys
from sd_video_gen_tpu.predict.predict import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--train_mode", "text"])
