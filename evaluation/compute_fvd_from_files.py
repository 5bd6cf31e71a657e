"""python -m evaluation.compute_fvd_from_files — offline FVD from PNG dirs."""
from sd_video_gen_tpu.evaluation.compute_fvd_from_files import main

if __name__ == "__main__":
    main()
