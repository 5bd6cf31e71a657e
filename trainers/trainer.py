"""python -m trainers.trainer — teacher-forced AR training (reference CLI)."""
from sd_video_gen_tpu.train.trainer import main

if __name__ == "__main__":
    main()
