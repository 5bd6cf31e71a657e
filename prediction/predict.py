"""python -m prediction.predict — AR rollout prediction (reference CLI)."""
from sd_video_gen_tpu.predict.predict import main

if __name__ == "__main__":
    main()
