"""python -m evaluation.predict_fvd2 — rollout + batch-of-16 FVD (VideoGPT
lineage)."""
import sys
from sd_video_gen_tpu.evaluation.predict_fvd import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--fvd_api", "batch"])
