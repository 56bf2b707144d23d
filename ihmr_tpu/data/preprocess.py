"""Host-side image + annotation preprocessing (NumPy/cv2).

Port of ref src/data/data_preprocess.py ``DataProcessor``: letterbox
pad-and-resize (top-left anchored), left/right flip with joint + MANO-pose
mirroring, random rescale + placement, rotation (image + global orient +
joints), color jitter, motion blur with PSF kernels, and [-1, 1] joint
normalization. These run on the TPU-VM CPUs; the accelerated path (batched
uint8->normalized float) has a native C++ fast path in ihmr_tpu.native.
"""

from __future__ import annotations

import os
import os.path as osp
import random
from typing import Sequence

import cv2
import numpy as np

from ihmr_tpu.core import rotations as rot


def hand_type_str2array(hand_type: str) -> np.ndarray:
    if hand_type == "right":
        return np.array([1, 0], dtype=np.float32)
    if hand_type == "left":
        return np.array([0, 1], dtype=np.float32)
    assert hand_type == "interacting", f"{hand_type} not supported."
    return np.array([1, 1], dtype=np.float32)


def padding_and_resize(img: np.ndarray, joints_2d: np.ndarray, final_size: int = 224):
    """Letterbox to final_size, top-left anchored (ref :45-60)."""
    height, width = img.shape[:2]
    if height > width:
        ratio = final_size / height
        new_h, new_w = final_size, int(ratio * width)
    else:
        ratio = final_size / width
        new_h, new_w = int(ratio * height), final_size
    out = np.zeros((final_size, final_size, 3), dtype=np.uint8)
    out[:new_h, :new_w] = cv2.resize(img, (new_w, new_h))
    joints_2d = joints_2d.copy()
    joints_2d[:, :2] *= ratio
    return out, joints_2d


def flip_sample(img, hand_type_array, joints_2d, joints_3d, mano_pose, mano_betas, mano_params_weight):
    """Mirror image + swap left/right annotations (ref :63-93)."""
    img_new = np.fliplr(img).copy()
    hand_type_new = np.flip(hand_type_array).copy()

    joints_2d_new = np.zeros((42, 3), dtype=np.float32)
    joints_2d_new[:21] = joints_2d[21:]
    joints_2d_new[21:] = joints_2d[:21]
    joints_2d_new[:, 0] = img.shape[1] - joints_2d_new[:, 0]

    joints_3d_new = np.zeros((42, 4), dtype=np.float32)
    joints_3d_new[:21] = joints_3d[21:]
    joints_3d_new[21:] = joints_3d[:21]
    joints_3d_new[:, 0] = -joints_3d_new[:, 0]

    pose_new = np.zeros(96, dtype=np.float32)
    pose_new[:48] = np.asarray(rot.flip_hand_pose(mano_pose[48:].copy()))
    pose_new[48:] = np.asarray(rot.flip_hand_pose(mano_pose[:48].copy()))
    betas_new = np.zeros(20, dtype=np.float32)
    betas_new[:10] = mano_betas[10:]
    betas_new[10:] = mano_betas[:10]
    weight_new = mano_params_weight[::-1].copy()
    return img_new, hand_type_new, joints_2d_new, joints_3d_new, pose_new, betas_new, weight_new


def random_rescale(
    img, joints_2d, rng: random.Random, final_size: int = 224,
    rescale_range=(0.6, 1.0), use_random_position: bool = False,
):
    """Shrink into a random sub-square (ref :96-119)."""
    min_s, max_s = rescale_range
    scale = rng.random() * (max_s - min_s) + min_s
    new_size = int(final_size * scale)
    out = np.zeros((final_size, final_size, 3), dtype=np.uint8)
    y_pos = x_pos = 0
    if use_random_position:
        end = final_size - new_size - 1
        x_pos = rng.randint(0, end)
        y_pos = rng.randint(0, end)
    out[y_pos : y_pos + new_size, x_pos : x_pos + new_size] = cv2.resize(img, (new_size, new_size))
    joints_2d = joints_2d.copy()
    joints_2d[:, :2] *= scale
    joints_2d[:, 0] += x_pos
    joints_2d[:, 1] += y_pos
    return out, joints_2d


def rotate_image(image: np.ndarray, angle_deg: float) -> np.ndarray:
    center = tuple(np.array(image.shape[1::-1]) / 2)
    mat = cv2.getRotationMatrix2D(center, angle_deg, 1.0)
    return cv2.warpAffine(image, mat, image.shape[1::-1], flags=cv2.INTER_LINEAR)


def random_rotate(
    img, joints_2d, joints_3d, mano_pose, rng: random.Random,
    angle_range=(-90, 90), num_slice: int = 10,
):
    """Rotate image + orient + 2D/3D joints by a random slice angle
    (ref :122-143)."""
    slice_id = rng.randint(0, num_slice - 1)
    angle = (angle_range[1] - angle_range[0]) / num_slice * slice_id + angle_range[0]

    img = rotate_image(img.copy(), angle)
    mano_pose = mano_pose.copy()
    mano_pose[:3] = rot.rotate_orient_z(mano_pose[:3], angle)

    origin = np.array([[img.shape[1] / 2, img.shape[0] / 2]])
    j2_valid = joints_2d[:, -1:]
    j2 = rot.rotate_joints_2d(joints_2d[:, :2], origin, angle)
    joints_2d = np.concatenate([j2, j2_valid], axis=1).astype(np.float32)

    j3_valid = joints_3d[:, -1:]
    j3 = rot.rotate_joints_3d(joints_3d[:, :3], angle)
    joints_3d = np.concatenate([j3, j3_valid], axis=1).astype(np.float32)
    return img, joints_2d, joints_3d, mano_pose


def color_jitter(
    img: np.ndarray, rng: random.Random,
    brightness=(0.9, 1.3), contrast=(0.8, 1.3), saturation=(0.4, 1.6), hue=(-0.1, 0.1),
) -> np.ndarray:
    """Brightness/contrast/saturation/hue jitter (ref :23-28,146-152),
    implemented directly in numpy/cv2 (uniform factors like torchvision)."""
    out = img.astype(np.float32)
    b = rng.uniform(*brightness)
    out = out * b
    c = rng.uniform(*contrast)
    mean = out.mean()
    out = (out - mean) * c + mean
    hsv = cv2.cvtColor(np.clip(out, 0, 255).astype(np.uint8), cv2.COLOR_BGR2HSV).astype(np.float32)
    s = rng.uniform(*saturation)
    hsv[..., 1] = np.clip(hsv[..., 1] * s, 0, 255)
    h = rng.uniform(*hue)
    hsv[..., 0] = (hsv[..., 0] + h * 180.0) % 180.0
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def load_blur_kernels(blur_kernel_dir: str) -> list:
    """PSF kernels from .mat files (ref src/data/data_utils.py:73-79)."""
    from scipy.io import loadmat

    kernels = []
    if blur_kernel_dir and osp.isdir(blur_kernel_dir):
        for name in sorted(os.listdir(blur_kernel_dir)):
            if name.endswith(".mat"):
                raw = loadmat(osp.join(blur_kernel_dir, name))["PSFs"][0][0]
                # MATLAB cell arrays round-trip as object arrays; coerce
                while isinstance(raw, np.ndarray) and raw.dtype == object and raw.size == 1:
                    raw = raw.item(0)
                if isinstance(raw, np.ndarray) and raw.dtype == object:
                    raw = np.asarray(raw.tolist(), np.float32)
                kernels.append(np.asarray(raw, np.float32))
    return kernels


def add_motion_blur(img: np.ndarray, kernels: Sequence[np.ndarray], rng: random.Random, prob: float = 0.5):
    if kernels and rng.random() < prob:
        return cv2.filter2D(img, -1, rng.choice(list(kernels)))
    return img


def normalize_joints_2d(joints_2d: np.ndarray, final_size: int = 224) -> np.ndarray:
    """Pixel coords -> [-1, 1] (ref :162-168)."""
    out = joints_2d.copy()
    out[:, 0] = (joints_2d[:, 0] / final_size) * 2.0 - 1.0
    out[:, 1] = (joints_2d[:, 1] / final_size) * 2.0 - 1.0
    return out


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC in [-1, 1], CHANNEL ORDER PRESERVED.

    The reference applies torchvision ToTensor+Normalize(.5,.5) directly to
    the cv2-decoded array (ref baseline_dataset.py:41-44,123,202), and
    ToTensor does NOT reorder channels — the reference therefore trains and
    infers on BGR images. Reproduced exactly (the round-3 dataset oracle,
    tests/test_ref_e2e_datasets.py, caught an RGB flip here that would have
    broken imported reference checkpoints). Keeps NHWC (TPU conv layout)."""
    x = img.astype(np.float32) / 255.0
    return (x - 0.5) / 0.5
