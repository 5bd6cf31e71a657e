"""python -m evaluation.predict_fvd2_denoise — text model + denoise + FVD."""
import sys
from sd_video_gen_tpu.evaluation.predict_fvd import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--fvd_api", "batch", "--denoise", "True"])
