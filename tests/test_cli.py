"""CLI smoke tests (subprocess, synthetic corpus + synthetic MANO)."""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from tests.test_data import _write_synthetic_corpus

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "ihmr_tpu.cli"] + args,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clicorpus"))
    _write_synthetic_corpus(root, n=4)
    return root


def test_cli_help():
    r = _run(["--help"], cwd=REPO)
    assert r.returncode == 0
    for cmd in ("train-baseline", "test-baseline", "optimize", "train-mlp", "test-mlp", "visualize"):
        assert cmd in r.stdout


def test_cli_optimize_smoke(corpus, tmp_path):
    r = _run(
        [
            "optimize",
            "--data_root", corpus,
            "--anno_path", "anno.pkl",
            "--pred_path", "pred.pkl",
            "--batchSize", "4",
            "--synthetic_mano",
            "--stage_epochs", "2",
            "--save_mid_freq", "1",
        ],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mpjpe_3d" in r.stdout and "collision_ave" in r.stdout
    assert "total time cost" in r.stdout  # OptTimeStat summary printed
    # evaluator artifact written in the reference layout
    assert osp.exists(str(tmp_path / "evaluate_results" / "optimize" / "hand26m.pkl"))


def test_cli_three_phase_pipeline(corpus, tmp_path):
    """The reference's baseline -> OPT -> MLP chain, reproduced purely from
    the command line (ref bash/{test_baseline,optimize,train_mlp}.sh +
    src/data/data_utils.py:42-70 hand-off)."""
    cwd = str(tmp_path)
    common = [
        "--data_root", corpus, "--anno_path", "anno.pkl", "--batchSize", "2",
        "--synthetic_mano", "--inputSize", "64", "--main_encoder", "resnet18",
        "--checkpoints_dir", osp.join(cwd, "ckpt"),
    ]
    # phase 0: one tiny training epoch to produce a 'latest' checkpoint
    r = _run(["train-baseline", "--total_epoch", "1", "--save_epoch_freq", "1"] + common, cwd=cwd)
    assert r.returncode == 0, r.stderr[-2000:]

    # phase 1: baseline eval exports the prediction pkl
    pred_pkl = osp.join(cwd, "chain_pred.pkl")
    r = _run(["test-baseline", "--export_pred", pred_pkl] + common, cwd=cwd)
    assert r.returncode == 0, r.stderr[-2000:]
    assert osp.exists(pred_pkl) and "exported prediction pkl" in r.stdout

    # phase 2: OPT consumes it and exports pseudo-GT
    pgt_pkl = osp.join(cwd, "opt_pseudo_gt.pkl")
    r = _run(
        ["optimize", "--pred_path", pred_pkl, "--stage_epochs", "2",
         "--save_mid_freq", "1", "--export_pseudo_gt", pgt_pkl] + common,
        cwd=cwd,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert osp.exists(pgt_pkl) and "exported OPT pseudo-GT" in r.stdout

    # phase 3: MLP trains against baseline preds + OPT pseudo-GT
    r = _run(
        ["train-mlp", "--pred_path", pred_pkl, "--use_opt_params",
         "--opt_params_path", pgt_pkl, "--stage_epochs", "1"] + common,
        cwd=cwd,
    )
    assert r.returncode == 0, r.stderr[-2000:]
