from gen6d_tpu.geometry import rotations, transform2d, pose, camera, solvers, metrics
from gen6d_tpu.geometry.fps import sample_fps_points
