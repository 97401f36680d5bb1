"""Farthest-point sampling (host-side numpy: tiny inputs, runs once per build).

Matches reference sample_fps_points (utils/base_utils.py:558-586).
"""
import numpy as np


def sample_fps_points(points, sample_num, init_center=True, index_model=False,
                      init_first=False, init_first_index=0, init_point=None,
                      rng=None):
    points = np.asarray(points)
    sample_num = min(points.shape[0], sample_num)
    output_index = []
    if init_point is None:
        if init_center:
            init_point = np.mean(points, 0)
        else:
            if init_first:
                init_index = init_first_index
            else:
                rng = rng or np.random
                init_index = rng.randint(0, points.shape[0])
            init_point = points[init_index]
            output_index.append(init_index)

    output_points = [init_point]
    cur_point = init_point
    distance = np.full(points.shape[0], 1e8)
    for _ in range(min(sample_num - 1, points.shape[0] - 1)):
        cur_distance = np.linalg.norm(cur_point[None, :] - points, 2, 1)
        distance = np.minimum(cur_distance, distance)
        cur_index = int(np.argmax(distance))
        cur_point = points[cur_index]
        output_points.append(cur_point)
        output_index.append(cur_index)

    if index_model:
        return np.asarray(output_index)
    return np.asarray(output_points)
