"""MANO asset loading.

Two sources:

  * ``load_mano_model`` / ``load_mano_pair`` — read the official
    ``MANO_{LEFT,RIGHT}.pkl`` files (the same licensed assets the reference
    consumes through smplx; ref: src/models/baseline_model.py:133-153). The
    pickles contain chumpy objects and scipy sparse matrices; we unpickle them
    without chumpy installed via a tolerant shim and convert everything to
    plain numpy.
  * ``synthetic_mano_model`` — a deterministic, anatomically-plausible
    synthetic hand with the exact MANO tensor shapes (778 verts / 1538 faces /
    16 joints / 10 betas / 135-dim pose corrective space). Used by the test
    suite and benchmarks so the framework is exercisable without licensed
    assets. The left synthetic hand is the exact x-mirror of the right —
    which is also the mathematical relationship between the real MANO hands.

The known MANO-left ``shapedirs`` x-sign bug is reproduced/fixed the same way
as the reference (ref: baseline_model.py:145-149): if the loaded left/right
shapedirs x-rows coincide, the left x-row is negated.
"""

from __future__ import annotations

import io
import os.path as osp
import pickle
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ihmr_tpu.mano.model import (
    MANO_PARENTS,
    NUM_BETAS,
    NUM_JOINTS,
    NUM_POSE_JOINTS,
    NUM_VERTS,
    ManoModel,
)


class _Stub:
    """Placeholder for unpicklable classes (chumpy.Ch); keeps raw state."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {"state": state})


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _Stub


def _to_numpy(obj) -> np.ndarray:
    if isinstance(obj, np.ndarray):
        return np.asarray(obj, np.float64)
    if hasattr(obj, "toarray"):  # scipy sparse
        return np.asarray(obj.toarray(), np.float64)
    for attr in ("r", "x", "v"):  # chumpy conventions
        if hasattr(obj, attr):
            return _to_numpy(getattr(obj, attr))
    if isinstance(obj, _Stub):
        for key in ("x", "r", "v", "a"):
            if key in obj.__dict__:
                return _to_numpy(obj.__dict__[key])
    return np.asarray(obj, np.float64)


def _load_raw_pkl(path: str) -> Dict:
    with open(path, "rb") as f:
        data = f.read()
    return _TolerantUnpickler(io.BytesIO(data), encoding="latin1").load()


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave 10-bit ints with two zero bits (Morton encoding helper)."""
    v = v.astype(np.uint64)
    v = (v | (v << 16)) & np.uint64(0x030000FF)
    v = (v | (v << 8)) & np.uint64(0x0300F00F)
    v = (v | (v << 4)) & np.uint64(0x030C30C3)
    v = (v | (v << 2)) & np.uint64(0x09249249)
    return v


def sort_faces_spatially(v_template: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Reorder faces by Morton code of their rest-pose centroids.

    Spatially coherent triangle tiles give the pallas collision kernel tight
    per-tile bounding spheres, which is what makes its tile pruning effective.
    Purely an ordering change — all consumers take a min/sum over faces.
    """
    v = np.asarray(v_template, np.float64)
    f = np.asarray(faces, np.int64)
    centroid = v[f].mean(axis=1)
    lo = centroid.min(0)
    span = np.maximum(centroid.max(0) - lo, 1e-9)
    q = np.clip(((centroid - lo) / span * 1023).astype(np.int64), 0, 1023)
    morton = (
        _spread_bits(q[:, 0]) | (_spread_bits(q[:, 1]) << np.uint64(1)) | (_spread_bits(q[:, 2]) << np.uint64(2))
    )
    return f[np.argsort(morton, kind="stable")]


def _on_host_cpu():
    """Device context for asset construction: MANO tensors are host assets;
    building them on the default (possibly remote TPU) device would force
    device->host pulls later, which the axon tunnel handles poorly."""
    import jax

    return jax.default_device(jax.devices("cpu")[0])


def load_mano_model(path: str, is_rhand: bool, dtype=jnp.float32) -> Tuple[ManoModel, np.ndarray]:
    """Load one ``MANO_*.pkl``. Returns (model, hands_mean (45,))."""
    raw = _load_raw_pkl(path)
    v_template = _to_numpy(raw["v_template"]).reshape(NUM_VERTS, 3)
    shapedirs = _to_numpy(raw["shapedirs"])[..., :NUM_BETAS].reshape(NUM_VERTS, 3, NUM_BETAS)
    posedirs = _to_numpy(raw["posedirs"]).reshape(NUM_VERTS * 3, 9 * NUM_POSE_JOINTS).T
    j_regressor = _to_numpy(raw["J_regressor"]).reshape(NUM_JOINTS, NUM_VERTS)
    lbs_weights = _to_numpy(raw["weights"]).reshape(NUM_VERTS, NUM_JOINTS)
    faces = np.asarray(_to_numpy(raw["f"]), np.int64).reshape(-1, 3)
    faces = sort_faces_spatially(v_template, faces)
    hands_mean = _to_numpy(raw.get("hands_mean", np.zeros(3 * NUM_POSE_JOINTS))).reshape(-1)

    kintree = raw.get("kintree_table")
    if kintree is not None:
        parents = np.asarray(_to_numpy(kintree), np.int64)[0].astype(np.int32)
        parents[0] = -1
        assert np.array_equal(parents, MANO_PARENTS), "unexpected MANO kinematic tree"

    with _on_host_cpu():
        model = ManoModel(
            v_template=jnp.asarray(v_template, dtype),
            shapedirs=jnp.asarray(shapedirs, dtype),
            posedirs=jnp.asarray(posedirs, dtype),
            j_regressor=jnp.asarray(j_regressor, dtype),
            lbs_weights=jnp.asarray(lbs_weights, dtype),
            faces=jnp.asarray(faces, jnp.int32),
            is_rhand=is_rhand,
        )
    return model, hands_mean.astype(np.float64)


def load_mano_pair(model_root: str, dtype=jnp.float32):
    """Load both hands and apply the left-shapedirs x-flip fix.

    Returns dict {'right': (model, hands_mean), 'left': (model, hands_mean)}.
    """
    right, right_mean = load_mano_model(osp.join(model_root, "MANO_RIGHT.pkl"), True, dtype)
    left, left_mean = load_mano_model(osp.join(model_root, "MANO_LEFT.pkl"), False, dtype)
    shape_diff = float(jnp.mean(jnp.abs(left.shapedirs[:, 0, :] - right.shapedirs[:, 0, :])))
    if shape_diff < 1e-7:  # the well-known left-hand MANO bug (ref fix)
        left = left.replace(shapedirs=left.shapedirs.at[:, 0, :].multiply(-1.0))
    return {"right": (right, right_mean), "left": (left, left_mean)}


def mirror_mano_model(right: ManoModel) -> ManoModel:
    """Construct the exact x-mirrored (left) model from a right-hand model.

    Derivation: with M = diag(-1, 1, 1) and the axis-angle flip
    theta_L = flip_yz(theta_R), rotations satisfy R_L = M R_R M, so
      * v_template / shapedirs flip their x rows;
      * posedirs rows pick up sign s_l * M_cc where s_l is -1 exactly when the
        corresponding rotation-matrix entry (i, j) has one index == 0;
      * J_regressor / lbs_weights are unchanged; face winding is reversed to
        keep outward normals.
    """
    M = np.array([-1.0, 1.0, 1.0])
    # sign pattern over a flattened 3x3 rotation block (row-major i*3+j)
    sign9 = np.array([[1 if (i == 0) == (j == 0) else -1 for j in range(3)] for i in range(3)])
    s_l = np.tile(sign9.reshape(9), NUM_POSE_JOINTS).astype(np.float64)  # (135,)
    pd = np.asarray(right.posedirs).reshape(9 * NUM_POSE_JOINTS, NUM_VERTS, 3)
    pd_left = pd * s_l[:, None, None] * M[None, None, :]
    return ManoModel(
        v_template=right.v_template * jnp.asarray(M, right.v_template.dtype),
        shapedirs=right.shapedirs * jnp.asarray(M, right.shapedirs.dtype)[None, :, None],
        posedirs=jnp.asarray(pd_left.reshape(9 * NUM_POSE_JOINTS, NUM_VERTS * 3), right.posedirs.dtype),
        j_regressor=right.j_regressor,
        lbs_weights=right.lbs_weights,
        faces=jnp.asarray(np.asarray(right.faces)[:, ::-1], jnp.int32),
        is_rhand=False,
    )


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    golden = np.pi * (1.0 + 5.0**0.5)
    theta = golden * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], axis=1
    )


def _convex_hull_faces(points: np.ndarray) -> np.ndarray:
    from scipy.spatial import ConvexHull

    hull = ConvexHull(points)
    faces = hull.simplices.astype(np.int64)
    # orient faces outward (centroid at origin-ish)
    centroid = points.mean(axis=0)
    tri = points[faces]
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    outward = np.einsum("fd,fd->f", normals, tri.mean(axis=1) - centroid) > 0
    faces[~outward] = faces[~outward][:, ::-1]
    return faces


def synthetic_mano_model(seed: int = 0, dtype=jnp.float32) -> ManoModel:
    """Deterministic synthetic right hand with MANO's exact tensor shapes.

    Geometry: an ellipsoidal "palm+fingers" point cloud of 778 vertices whose
    surface is a convex deformation of a sphere (guaranteeing a closed,
    outward-oriented triangulation via its convex hull — the collision op
    relies on watertight orientation). Joints are placed along five finger
    rays; skinning weights fall off smoothly with distance to each bone.
    Faces are re-triangulated from the hull and padded/truncated to 1538.
    """
    rng = np.random.RandomState(seed)

    # --- vertices: deformed sphere (convex => hull gives a closed mesh)
    sphere = _fibonacci_sphere(NUM_VERTS)
    radii = 0.04 * (1.0 + 0.35 * sphere[:, 0] ** 2 + 0.2 * sphere[:, 1] ** 2)
    v_template = sphere * radii[:, None]
    v_template[:, 0] += 0.04  # shift "fingers" along +x, wrist near origin

    faces = _convex_hull_faces(v_template)
    if faces.shape[0] >= 1538:
        faces = faces[:1538]
    else:  # pad by repeating (degenerate-free: reuse existing faces)
        reps = np.resize(np.arange(faces.shape[0]), 1538 - faces.shape[0])
        faces = np.concatenate([faces, faces[reps]], axis=0)
    faces = sort_faces_spatially(v_template, faces)

    # --- joints: wrist at origin-ish, 5 fingers x 3 joints along rays
    j_pos = np.zeros((NUM_JOINTS, 3))
    j_pos[0] = np.array([0.0, 0.0, 0.0])
    finger_dirs = np.stack(
        [
            np.array([1.0, y, 0.15 * z]) / np.linalg.norm([1.0, y, 0.15 * z])
            for y, z in [(0.5, 1), (0.2, 0), (-0.4, -1), (-0.15, -0.5), (0.8, 0.3)]
        ]
    )
    for f in range(5):
        for k in range(3):
            j_pos[1 + f * 3 + k] = finger_dirs[f] * (0.035 + 0.018 * (k + 1))

    # --- J_regressor: soft-assign each joint to its nearest vertices
    d = np.linalg.norm(v_template[None, :, :] - j_pos[:, None, :], axis=2)  # (16, 778)
    jr = np.exp(-((d / 0.01) ** 2))
    jr[jr < 1e-8] = 0.0
    # ensure at least a few support verts per joint
    for j in range(NUM_JOINTS):
        if jr[j].sum() < 1e-6:
            nearest = np.argsort(d[j])[:8]
            jr[j, nearest] = 1.0
    j_regressor = jr / jr.sum(axis=1, keepdims=True)
    # re-snap joints to regressed positions for consistency
    j_pos = j_regressor @ v_template

    # --- lbs weights: softmax over negative distance to joints
    w = np.exp(-((d.T / 0.02) ** 2))  # (778, 16)
    w[:, 0] += 0.05  # wrist base support
    lbs_weights = w / w.sum(axis=1, keepdims=True)

    # --- blend shapes: smooth random low-frequency fields (deterministic)
    basis = np.stack([np.sin(3.1 * sphere @ rng.randn(3)) for _ in range(NUM_BETAS)], axis=-1)
    shapedirs = 0.004 * basis[:, None, :] * (0.5 + sphere)[:, :, None]
    posedirs = 0.002 * rng.randn(9 * NUM_POSE_JOINTS, NUM_VERTS * 3) / np.sqrt(NUM_VERTS)

    with _on_host_cpu():
        return ManoModel(
            v_template=jnp.asarray(v_template, dtype),
            shapedirs=jnp.asarray(shapedirs, dtype),
            posedirs=jnp.asarray(posedirs, dtype),
            j_regressor=jnp.asarray(j_regressor, dtype),
            lbs_weights=jnp.asarray(lbs_weights, dtype),
            faces=jnp.asarray(faces, jnp.int32),
            is_rhand=True,
        )
