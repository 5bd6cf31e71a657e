from sd_video_gen_tpu.train.trainer import Trainer, make_train_step, make_eval_step
