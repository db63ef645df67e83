import json, time
import jax.numpy as jnp
from bench import bench_model
from det_sam2_tpu.configs import sam2_1_hiera_l, with_image_size
fps = bench_model(with_image_size(sam2_1_hiera_l(), 1024))
print(json.dumps({"metric": "propagate_fps_hiera_l_1024_2obj", "value": round(fps, 2)}))
