"""Weak-perspective camera projection.

ref: src/models/transform_utils.py:47-54 ``batch_orthogonal_project``:
with camera (s, tx, ty), a 3D point X projects to s * (X[:2] + (tx, ty)).
"""

from __future__ import annotations

import jax.numpy as jnp


def orthographic_project(points: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Project (..., N, 3) points with (..., 3) weak-perspective cameras.

    Returns (..., N, 2) in the normalized [-1, 1] image frame used throughout
    the pipeline.
    """
    cam = camera[..., None, :]  # (..., 1, 3)
    xy = points[..., :2] + cam[..., 1:3]
    return cam[..., 0:1] * xy
