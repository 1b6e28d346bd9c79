"""Config round-trip + ATE metric tests."""
import numpy as np
import pytest

from panst3r_tpu.core import config as cfglib
from panst3r_tpu.engine.eval import ate_rmse, umeyama_alignment
from panst3r_tpu.models.presets import panst3r_v1_config, panst3r_v2_config


def test_config_roundtrip(tmp_path):
    cfg = panst3r_v1_config()
    cfglib.save_yaml(cfg, tmp_path / "c.yaml")
    back = cfglib.load_yaml(tmp_path / "c.yaml")
    assert back == cfg or cfglib.to_dict(back) == cfglib.to_dict(cfg)

    cfg2 = panst3r_v2_config()
    d = cfglib.to_dict(cfg2)
    back2 = cfglib.from_dict(d)
    assert cfglib.to_dict(back2) == d
    assert back2.panoptic.input_mixer is not None


def test_experiment_config_yaml():
    from panst3r_tpu.apps.train import ExperimentConfig  # registers

    exp = cfglib.load_yaml("configs/train_v1.yaml")
    assert exp.model_preset == "v1"
    assert exp.train.epochs == 200
    assert exp.train.loss.num_points == 12288
    exp2 = cfglib.load_yaml("configs/train_v2.yaml")
    assert exp2.model_preset == "v2"


def test_umeyama_and_ate(rng):
    N = 50
    src = rng.standard_normal((N, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ R.T + t_true

    s, R2, t = umeyama_alignment(src, dst)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R2, R, atol=1e-8)

    poses_p = np.tile(np.eye(4), (N, 1, 1))
    poses_g = np.tile(np.eye(4), (N, 1, 1))
    poses_p[:, :3, 3] = src
    poses_g[:, :3, 3] = dst
    assert ate_rmse(poses_p, poses_g) < 1e-8          # alignable → 0
    assert ate_rmse(poses_p, poses_g, align=False) > 1.0
