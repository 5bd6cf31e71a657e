"""python -m trainers.trainer_fvd — training with periodic FVD validation
(the reference computed FVD on epochs where epoch % 5 == 1)."""
import sys
from sd_video_gen_tpu.train.trainer import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--fvd_every" not in argv:
        argv += ["--fvd_every", "5"]
    main(argv)
