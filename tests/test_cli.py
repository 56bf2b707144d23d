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
