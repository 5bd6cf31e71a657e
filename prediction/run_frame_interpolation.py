"""python -m prediction.run_frame_interpolation — FILM interpolation glue."""
from sd_video_gen_tpu.predict.run_frame_interpolation import main

if __name__ == "__main__":
    main()
