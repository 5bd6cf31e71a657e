"""python -m prediction.predict_naive_fvd — naive baseline + FVD scoring."""
import sys
from sd_video_gen_tpu.evaluation.predict_fvd import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--naive", "True"])
