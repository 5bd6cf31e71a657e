"""Reference-compatible entry points: `python -m trainers.<name>` maps onto
the unified Trainer (sd_video_gen_tpu/train/trainer.py) with the matching
strategy flags — same CLI surface as the reference scripts."""
