"""python -m evaluation.predict_fvd — rollout + streaming-stats FVD."""
import sys
from sd_video_gen_tpu.evaluation.predict_fvd import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--fvd_api", "streaming"])
