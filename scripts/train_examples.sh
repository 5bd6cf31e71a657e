#!/usr/bin/env bash
# Launch recipes (the reference shipped per-machine scripts train_hela.sh /
# train_thanos.sh / train_ultron.sh + rsync sync_devices.sh; here one machine-
# agnostic script shows the equivalent launches — checkpoints are Orbax dirs,
# no rsync dance needed with a shared filesystem).
set -euo pipefail

# bouncing ball, small, save-best
python -m sd_video_gen_tpu.train.trainer --dataset ball \
  --config ball_complex_L1_64 --folder data/ball --save_best True "$@"

# KITTI future-frame with SD-VAE latents
# python -m sd_video_gen_tpu.train.trainer --dataset kitti --config kitti_L1_64 \
#   --folder data/kitti --codec vae --vae_weights weights/sd_vae.safetensors

# UCF flagship, full grid sweep, multi-chip mesh
# python -m sd_video_gen_tpu.train.trainer --dataset ucf --config ucf_final \
#   --sweep --mesh data=4,model=2 --flip True

# UCF text-conditioned
# python -m sd_video_gen_tpu.train.trainer --dataset ucf --config ucf_text_final \
#   --train_mode text

# in-training FVD every 5 epochs (trainer_fvd role)
# python -m sd_video_gen_tpu.train.trainer --dataset ucf --config ucf_final \
#   --fvd_every 5 --i3d_weights weights/i3d_400.pt
