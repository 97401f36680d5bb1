"""Image-batch dict builders (port of reference utils/imgs_info.py:7-27),
channel-last float [0,1]."""
import numpy as np


def build_imgs_info(database, img_ids, has_mask=True):
    """-> {'imgs' (n,h,w,3) float, 'poses' (n,3,4), 'Ks' (n,3,3)
    [, 'masks' (n,h,w)]} ."""
    imgs = np.stack([database.get_image(i) for i in img_ids], 0)
    info = {
        'imgs': imgs.astype(np.float32) / 255.0,
        'poses': np.stack([database.get_pose(i) for i in img_ids], 0).astype(np.float32),
        'Ks': np.stack([database.get_K(i) for i in img_ids], 0).astype(np.float32),
    }
    if has_mask:
        info['masks'] = np.stack([database.get_mask(i).astype(np.float32)
                                  for i in img_ids], 0)
    return info
