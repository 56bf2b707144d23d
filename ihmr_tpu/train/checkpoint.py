"""Checkpointing: orbax pytrees with the reference's label scheme, plus a
torch ``.pth`` importer for reference-weight bootstrap.

Reference contract (ref src/models/base_model.py:23-72): weights saved as
``{label}_net_{name}.pth`` plus ``{label}_info.pth`` (epoch + optimizer),
with ``_stage_{k:02d}`` suffixes for MLP heads (ref mlp_model.py:834-846);
a ``latest`` label is rewritten every epoch. Here each label is one orbax
checkpoint directory ``{label}_net_{name}`` holding the params pytree, and
``{label}_info`` holding epoch/opt-state.

``import_torch_resnet`` maps torchvision-style ResNet state dicts (the
reference's pretrained backbone; ref resnet.py:180-190) onto the flax
ResNet in ihmr_tpu.models.resnet, including NCHW->HWIO kernel transposition.
"""

from __future__ import annotations

import os.path as osp
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np



def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _ckpt_name(label: str, name: str, stage_id: Optional[int] = None) -> str:
    suffix = f"_stage_{stage_id:02d}" if stage_id is not None else ""
    return f"{label}_net_{name}{suffix}"


def save_network(ckpt_dir: str, tree: Any, name: str, label: str, stage_id: Optional[int] = None):
    path = osp.join(osp.abspath(ckpt_dir), _ckpt_name(label, name, stage_id))
    ckptr = _checkpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)
    return path


def load_network(ckpt_dir: str, name: str, label: str, stage_id: Optional[int] = None) -> Optional[Any]:
    """Returns the pytree or None when missing (the reference returns a bool;
    ref base_model.py:45-61)."""
    path = osp.join(osp.abspath(ckpt_dir), _ckpt_name(label, name, stage_id))
    if not osp.exists(path):
        return None
    return _checkpointer().restore(path)


def save_info(ckpt_dir: str, info: Dict, label: str, stage_id: Optional[int] = None):
    suffix = f"_stage_{stage_id:02d}" if stage_id is not None else ""
    path = osp.join(osp.abspath(ckpt_dir), f"{label}_info{suffix}")
    _checkpointer().save(path, jax.tree_util.tree_map(np.asarray, info), force=True)
    return path


def load_info(ckpt_dir: str, label: str, stage_id: Optional[int] = None) -> Optional[Dict]:
    suffix = f"_stage_{stage_id:02d}" if stage_id is not None else ""
    path = osp.join(osp.abspath(ckpt_dir), f"{label}_info{suffix}")
    if not osp.exists(path):
        return None
    return _checkpointer().restore(path)


def restore_tree_like(target: Any, data: Any) -> Any:
    """Rebuild ``data`` (as restored by orbax: namedtuples/dataclasses ->
    dicts, tuples -> lists or {"0": ...} dicts) into the exact pytree
    structure of ``target`` — needed to resume optax optimizer states."""
    if target is None:
        return None
    if data is None:
        # orbax collapses leaf-less subtrees (e.g. optax EmptyState) to None
        if jax.tree_util.tree_leaves(target):
            raise ValueError("checkpoint missing data for a non-empty subtree")
        return target
    if isinstance(target, dict):
        return {k: restore_tree_like(target[k], data[k]) for k in target}
    if hasattr(target, "_fields"):  # namedtuple (optax states)
        if isinstance(data, dict):
            vals = [restore_tree_like(getattr(target, f), data[f]) for f in target._fields]
        else:
            vals = [restore_tree_like(t, d) for t, d in zip(tuple(target), data)]
        return type(target)(*vals)
    if isinstance(target, (list, tuple)):
        if isinstance(data, dict):  # {"0": ..., "1": ...}
            data = [data[str(i)] for i in range(len(target))]
        return type(target)(restore_tree_like(t, d) for t, d in zip(target, data))
    return np.asarray(data).astype(np.asarray(target).dtype).reshape(np.shape(target))


# ---------------------------------------------------------------------------
# torch .pth import


def _torch_load(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in state.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def import_torch_resnet(
    pth_path_or_state, flax_params: Dict, flax_batch_stats: Dict, strict: bool = False
) -> Tuple[Dict, Dict]:
    """Map a torchvision/reference ResNet state dict onto our flax ResNet.

    Returns (params, batch_stats) with matched leaves replaced. Unmatched
    torch keys are ignored unless ``strict``.
    """
    if isinstance(pth_path_or_state, str):
        state = _torch_load(pth_path_or_state)
    else:
        state = {
            k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in dict(pth_path_or_state).items()
        }
    params = jax.tree_util.tree_map(np.asarray, flax_params)
    stats = jax.tree_util.tree_map(np.asarray, flax_batch_stats)

    def put(d: Dict, path, value):
        node = d
        for key in path[:-1]:
            if key not in node:
                return False
            node = node[key]
        if path[-1] not in node:
            return False
        assert node[path[-1]].shape == value.shape, (path, node[path[-1]].shape, value.shape)
        node[path[-1]] = value.astype(node[path[-1]].dtype)
        return True

    unmatched = []
    for tkey, value in state.items():
        m = re.match(r"layer(\d)\.(\d+)\.(.+)", tkey)
        if m:
            stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"layer{stage}_{block}"
            ok = _map_block_param(params, stats, base, rest, value, put)
        elif tkey.startswith("conv1."):
            ok = put(params, ("conv1", "kernel"), _conv_kernel(value))
        elif tkey.startswith("bn1."):
            ok = _map_bn(params, stats, ("bn1",), tkey.split(".", 1)[1], value, put)
        elif tkey.startswith("fc1."):
            ok = put(
                params,
                ("fc1", "kernel" if tkey.endswith("weight") else "bias"),
                value.T if tkey.endswith("weight") else value,
            )
        elif tkey.startswith("fc."):
            ok = True  # torchvision classifier head: unused
        else:
            ok = False
        if not ok:
            unmatched.append(tkey)
    if strict and unmatched:
        raise KeyError(f"unmatched torch keys: {unmatched}")
    return params, stats


def import_torch_encoder(
    pth_path_or_state, flax_params: Dict, flax_batch_stats: Dict, strict: bool = False
) -> Tuple[Dict, Dict]:
    """Map a reference InterHandEncoder state dict onto our flax encoder.

    The reference's trained baseline checkpoints (``{epoch}_net_baseline.pth``,
    ref src/models/base_model.py:23-34) hold an encoder state dict with keys
    ``main_encoder.*`` (the vendored ResNet, ref src/models/resnet.py),
    ``feat_encoder.1.*`` (the 1024->1024 fc2), ``regressor_ih.0.*`` (the
    iterative residual regressor) and ``hand_classifier.0.*``
    (ref src/models/networks.py:45-63). This importer lets a reference user
    load those weights directly into the TPU rebuild.

    Returns (params, batch_stats) trees with matched leaves replaced.
    """
    if isinstance(pth_path_or_state, str):
        state = _torch_load(pth_path_or_state)
    else:
        state = {
            k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in dict(pth_path_or_state).items()
        }
    backbone_state = {
        k[len("main_encoder."):]: v
        for k, v in state.items()
        if k.startswith("main_encoder.")
    }
    params = jax.tree_util.tree_map(np.asarray, flax_params)
    stats = jax.tree_util.tree_map(np.asarray, flax_batch_stats)
    params["main_encoder"], stats["main_encoder"] = import_torch_resnet(
        backbone_state, params["main_encoder"], stats["main_encoder"], strict=strict
    )
    head_map = {
        "feat_encoder.1": "fc2",
        "regressor_ih.0": "regressor_ih",
        "hand_classifier.0": "hand_classifier",
    }
    unmatched = []
    for tkey, value in state.items():
        if tkey.startswith("main_encoder."):
            continue
        prefix, _, leaf = tkey.rpartition(".")
        fname = head_map.get(prefix)
        if fname is None or leaf not in ("weight", "bias") or fname not in params:
            unmatched.append(tkey)
            continue
        target = "kernel" if leaf == "weight" else "bias"
        value = value.T if leaf == "weight" else value
        assert params[fname][target].shape == value.shape, (tkey, value.shape)
        params[fname][target] = value.astype(params[fname][target].dtype)
    if strict and unmatched:
        raise KeyError(f"unmatched torch keys: {unmatched}")
    return params, stats


def _map_bn(params, stats, path: Tuple[str, ...], rest: str, value, put) -> bool:
    """path addresses the BN module inside both params and batch_stats."""
    if rest == "weight":
        return put(params, path + ("scale",), value)
    if rest == "bias":
        return put(params, path + ("bias",), value)
    if rest == "running_mean":
        return put(stats, path + ("mean",), value)
    if rest == "running_var":
        return put(stats, path + ("var",), value)
    return rest == "num_batches_tracked"


def _map_block_param(params, stats, base, rest, value, put) -> bool:
    m = re.match(r"conv(\d)\.weight$", rest)
    if m:
        return put(params, (base, f"conv{m.group(1)}", "kernel"), _conv_kernel(value))
    m = re.match(r"bn(\d)\.(.+)$", rest)
    if m:
        return _map_bn(params, stats, (base, f"bn{m.group(1)}"), m.group(2), value, put)
    if rest == "downsample.0.weight":
        return put(params, (base, "downsample_conv", "kernel"), _conv_kernel(value))
    m = re.match(r"downsample\.1\.(.+)$", rest)
    if m:
        return _map_bn(params, stats, (base, "downsample_bn"), m.group(1), value, put)
    return False
