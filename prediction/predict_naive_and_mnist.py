"""python -m prediction.predict_naive_and_mnist — Identity copy baseline."""
import sys
from sd_video_gen_tpu.predict.predict import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--naive", "True"])
