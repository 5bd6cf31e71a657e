from sd_video_gen_tpu.parallel.mesh import make_mesh, parse_mesh_spec
from sd_video_gen_tpu.parallel.sharding import (
    param_shardings, batch_sharding, replicated, diffusion_param_shardings,
)
