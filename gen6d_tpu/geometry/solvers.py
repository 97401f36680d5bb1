"""Pose solvers: similarity-transform composition/decomposition, sim->rigid
conversion, Umeyama/Procrustes fits, and a JAX Gauss-Newton PnP.

Mirrors reference utils/pose_utils.py:12-147,217-244 and estimator.py:14-47,
but jit/vmap-able end-to-end so the whole pose-init step runs on TPU.
"""
import jax
import jax.numpy as jnp

from gen6d_tpu.geometry import transform2d as t2d
from gen6d_tpu.geometry.camera import (project_points, let_me_look_at,
                                       pts_to_hpts, look_at_rotation)
from gen6d_tpu.geometry.pose import (pose_apply, pose_inverse,
                                     pose_compose as pose_compose_g)
from gen6d_tpu.geometry.rotations import (angle_to_rotation_2d, quat_to_mat,
                                          mat_to_quat, inplane_angle_szyx,
                                          rot_z)
from gen6d_tpu.utils.precision import f32


@f32
def estimate_pose_from_similarity_transform(ref_pose, ref_K, que_K, M_que_to_ref,
                                            object_center):
    """Lift a 2D similarity transform (query crop -> reference crop) to a 3D pose.

    Matches estimate_pose_from_similarity_transform (pose_utils.py:12-46).
    All args single-sample; vmap for batches.
    """
    M_ref_to_que = t2d.inverse_2d(M_que_to_ref)
    ref_cam = (-ref_pose[:, :3].T @ ref_pose[:, 3:])[..., 0]
    ref_obj_center, _ = project_points(object_center[None, :], ref_pose, ref_K)
    # object center in query pixels, then on the normalized image plane
    center_px = t2d.apply_2d(M_ref_to_que, ref_obj_center)[0]
    center_ndc = (pts_to_hpts(center_px[None]) @ jnp.linalg.inv(que_K).T)[0, :2]
    scale, rotation, _ = t2d.decompose_2d(M_ref_to_que)

    que_f = (que_K[0, 0] + que_K[1, 1]) / 2
    ref_f = (ref_K[0, 0] + ref_K[1, 1]) / 2
    # effective focal along the off-center viewing ray through the object
    ray_f = jnp.sqrt(que_f ** 2 + jnp.sum((center_ndc * que_f) ** 2))
    ref_dist = jnp.linalg.norm(ref_cam - object_center)
    que_dist = ref_dist * ray_f / ref_f / scale
    ray_dir = pts_to_hpts(center_ndc[None])[0]
    que_cen3d = ray_dir / jnp.linalg.norm(ray_dir) * que_dist

    ref_rot = ref_pose[:, :3]
    R0 = jnp.eye(3).at[:2, :2].set(angle_to_rotation_2d(rotation))
    R = look_at_rotation(center_ndc)
    que_rot = R.T @ (R0 @ ref_rot)
    que_trans = que_cen3d - que_rot @ object_center
    return jnp.concatenate([que_rot, que_trans[:, None]], 1)


@f32
def estimate_pose_from_similarity_transform_compose(position, scale_r2q, angle_r2q,
                                                    ref_pose, ref_K, que_K,
                                                    object_center):
    """Compose detection (position, scale) + selection (angle) into the query->ref
    similarity transform, then lift to a pose.

    Matches estimate_pose_from_similarity_transform_compose (pose_utils.py:104-111).
    """
    ref_cen, _ = project_points(object_center[None], ref_pose, ref_K)
    ref_cen = ref_cen[0]
    M = t2d.offset_2d(-position[0], -position[1])
    M = t2d.compose_2d(M, t2d.scale_2d(1.0 / scale_r2q))
    M = t2d.compose_2d(M, t2d.rotation_2d(-angle_r2q))
    M = t2d.compose_2d(M, t2d.offset_2d(ref_cen[0], ref_cen[1]))
    return estimate_pose_from_similarity_transform(ref_pose, ref_K, que_K, M,
                                                   object_center)


@f32
def scale_rotation_difference_from_cameras(ref_poses, que_poses, ref_Ks, que_Ks,
                                           center):
    """Relative 2D scale and in-plane rotation from ref views to que views.

    ref_poses/que_poses: (n,3,4), ref_Ks/que_Ks: (n,3,3), center: (3)
    -> (scale_diff (n,), angle_diff (n,)).
    Matches scale_rotation_difference_from_cameras (pose_utils.py:60-102),
    vectorized (the reference loops per view).
    """
    que_R, que_f = jax.vmap(let_me_look_at, in_axes=(0, 0, None))(que_poses, que_Ks, center)
    ref_R, ref_f = jax.vmap(let_me_look_at, in_axes=(0, 0, None))(ref_poses, ref_Ks, center)
    que_rot = que_R @ que_poses[:, :, :3]
    ref_rot = ref_R @ ref_poses[:, :, :3]

    ref_cam = (-jnp.swapaxes(ref_poses[:, :, :3], -1, -2) @ ref_poses[:, :, 3:])[..., 0]
    que_cam = (-jnp.swapaxes(que_poses[:, :, :3], -1, -2) @ que_poses[:, :, 3:])[..., 0]
    ref_dist = jnp.linalg.norm(ref_cam - center[None, :], axis=1)
    que_dist = jnp.linalg.norm(que_cam - center[None, :], axis=1)
    scale_diff = ref_dist / que_dist * que_f / ref_f

    rel_rot = que_rot @ jnp.swapaxes(ref_rot, -1, -2)
    angle_diff = inplane_angle_szyx(rel_rot)
    return scale_diff, angle_diff


@f32
def compose_sim_pose(scale, quat, offset, in_pose, object_center):
    """Compose the refiner's (scale, quaternion, 2D offset) prediction into a
    camera-space similarity transform. Matches compose_sim_pose
    (pose_utils.py:237-244)."""
    offset3 = jnp.concatenate([offset, jnp.zeros_like(offset[..., :1])], -1)
    rotation = quat_to_mat(quat)
    center_in = pose_apply(in_pose, object_center)
    center_que = center_in + offset3
    t = center_que - scale * (rotation @ center_in[..., None])[..., 0]
    return jnp.concatenate([scale * rotation, t[..., None]], -1)


@f32
def pose_sim_to_pose_rigid(pose_sim_in_to_que, pose_in, K_que, K_in, center):
    """Convert a camera-space similarity transform applied after ``pose_in`` into a
    rigid pose. Matches pose_sim_to_pose_rigid (pose_utils.py:217-235)."""
    f_que = (K_que[0, 0] + K_que[1, 1]) / 2
    f_in = (K_in[0, 0] + K_in[1, 1]) / 2
    center_in = pose_apply(pose_in, center)
    depth_in = center_in[2]

    U, S, Vt = jnp.linalg.svd(pose_sim_in_to_que[:3, :3])
    R = U @ Vt
    scale = jnp.mean(jnp.abs(S))
    depth_que = depth_in / scale * f_que / f_in

    center_sim = pose_apply(pose_sim_in_to_que, center_in)
    center_que = center_sim / center_sim[2] * depth_que

    rotation = R @ pose_in[:3, :3]
    offset = center_que - rotation @ center
    return jnp.concatenate([rotation, offset[:, None]], 1)


@f32
def approximate_rigid_to_similarity(pose_src, pose_tgt, K_src, K_tgt, center):
    """Approximate the rigid pose change src->tgt as a camera-space similarity
    transform (the refiner's GT; matches approximate_rigid_to_similarity,
    dataset/train_dataset.py:1185-1208)."""
    f_tgt = (K_tgt[0, 0] + K_tgt[1, 1]) / 2
    f_src = (K_src[0, 0] + K_src[1, 1]) / 2
    cen_src = pose_apply(pose_src, center)
    cen_tgt = pose_apply(pose_tgt, center)

    scale = cen_src[2] / cen_tgt[2] * f_tgt / f_src
    offset = (cen_tgt - cen_src).at[2].set(0.0) * scale  # 2D offset only
    rot = pose_compose_g(pose_inverse(pose_src), pose_tgt)[:3, :3]
    offset = offset + cen_src - scale * (rot @ cen_src[:, None])[:, 0]
    return jnp.concatenate([scale * rot, offset[:, None]], 1)


@f32
def decompose_similarity(pose_in, pose_sim, object_center):
    """(scale, quaternion, 3D offset) of a camera-space similarity transform
    (matches decomposed_transformations, train_dataset.py:1211-1218)."""
    cen0 = pose_apply(pose_in, object_center)
    cen1 = pose_apply(pose_sim, cen0)
    offset = cen1 - cen0
    U, S, Vt = jnp.linalg.svd(pose_sim[:, :3])
    rotation = mat_to_quat(U @ Vt)
    scale = jnp.mean(jnp.abs(S))
    return scale, rotation, offset


@f32
def similarity_transform_2pts(pts0, pts1):
    """Umeyama 2D similarity fit: s R p0 + t = p1.

    pts0/pts1: (...,k,2) -> (scale (...,1,1), rotation (...,2,2), offset (...,2,1)).
    Matches compute_similarity_transform_batch (estimator.py:31-47).
    """
    c0 = jnp.mean(pts0, -2)
    c1 = jnp.mean(pts1, -2)
    d0 = pts0 - c0[..., None, :]
    d1 = pts1 - c1[..., None, :]
    scale = (jnp.mean(jnp.linalg.norm(d1, axis=-1, keepdims=True), -2, keepdims=True) /
             jnp.mean(jnp.linalg.norm(d0, axis=-1, keepdims=True), -2, keepdims=True))
    d0_ = d0 * scale
    U, S, Vt = jnp.linalg.svd(jnp.swapaxes(d0_, -1, -2) @ d1)
    rotation = jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2)
    offset = -scale * (rotation @ c0[..., :, None]) + c1[..., :, None]
    return scale, rotation, offset


@f32
def ransac_similarity_transform(corr, key, iters=4096, inlier_thresh=5.0,
                                bad_seed_thresh=4.0):
    """Batched 2-point RANSAC for 2D similarity transforms, fixed iteration count
    (jit-friendly; the reference loops until a confidence bound,
    estimator.py:56-85).

    corr: (n,4) correspondences [x0,y0,x1,y1] -> (scale, rotation(2,2), offset(2,),
    inlier mask (n,)).
    """
    n = corr.shape[0]
    idx = jax.random.randint(key, (iters, 2), 0, n)
    seed0 = corr[idx[:, 0]]
    seed1 = corr[idx[:, 1]]
    bad = jnp.linalg.norm(seed0 - seed1, axis=1) < bad_seed_thresh
    seed = jnp.stack([seed0, seed1], 1)  # iters,2,4
    scale, rotation, offset = similarity_transform_2pts(seed[:, :, :2], seed[:, :, 2:])
    x0 = corr[None, :, :2]
    x1 = corr[None, :, 2:]
    x1_ = scale * (x0 @ jnp.swapaxes(rotation, -1, -2)) + jnp.swapaxes(offset, -1, -2)
    mask = jnp.linalg.norm(x1 - x1_, axis=2) < inlier_thresh  # iters,n
    inlier_num = jnp.where(bad, -1, jnp.sum(mask, 1))
    best = jnp.argmax(inlier_num)
    best_mask = mask[best]

    # weighted final fit over inliers (weights emulate the reference's masked refit)
    w = best_mask.astype(jnp.float32)[:, None]
    wsum = jnp.sum(w)
    c0 = jnp.sum(corr[:, :2] * w, 0) / wsum
    c1 = jnp.sum(corr[:, 2:] * w, 0) / wsum
    d0 = (corr[:, :2] - c0) * w
    d1 = (corr[:, 2:] - c1) * w
    s = (jnp.sum(jnp.linalg.norm(d1, axis=1)) / jnp.maximum(jnp.sum(jnp.linalg.norm(d0, axis=1)), 1e-8))
    U, _, Vt = jnp.linalg.svd((d0 * s).T @ d1)
    R = Vt.T @ U.T
    t = -s * (R @ c0) + c1
    return s, R, t, best_mask


@f32
def pnp_gauss_newton(points_3d, points_2d, K, pose_init, iters=10):
    """Least-squares PnP refinement by Gauss-Newton on the reprojection error,
    starting from ``pose_init``. JAX replacement for cv2.solvePnP in the video
    smoothing path (reference utils/pose_utils.py:246-279, predict.py:69).

    points_3d: (n,3), points_2d: (n,2), K: (3,3), pose_init: (3,4) -> (3,4).
    """
    def residual(params):
        w = params[:3]       # axis-angle delta rotation
        t = params[3:]       # translation
        # sqrt(w.w + eps): differentiable at w=0 (plain norm NaNs under jacfwd)
        theta = jnp.sqrt(jnp.sum(w * w) + 1e-12)
        k = w / theta
        Kx = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = jnp.eye(3) + jnp.sin(theta) * Kx + (1 - jnp.cos(theta)) * (Kx @ Kx)
        Rfull = R @ pose_init[:, :3]
        cam = points_3d @ Rfull.T + t
        img = cam @ K.T
        proj = img[:, :2] / jnp.maximum(img[:, 2:], 1e-6)
        return (proj - points_2d).reshape(-1)

    params = jnp.concatenate([jnp.zeros(3), pose_init[:, 3]])

    def step(params, _):
        r = residual(params)
        J = jax.jacfwd(residual)(params)
        JtJ = J.T @ J + 1e-6 * jnp.eye(6)
        delta = jnp.linalg.solve(JtJ, J.T @ r)
        return params - delta, None

    params, _ = jax.lax.scan(step, params, None, length=iters)
    w, t = params[:3], params[3:]
    theta = jnp.sqrt(jnp.sum(w * w) + 1e-12)
    k = w / theta
    Kx = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = jnp.eye(3) + jnp.sin(theta) * Kx + (1 - jnp.cos(theta)) * (Kx @ Kx)
    return jnp.concatenate([R @ pose_init[:, :3], t[:, None]], 1)
