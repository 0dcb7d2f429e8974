"""get_data_path .env semantics (reference dataloader/utils.py:109-119)."""
import os

from vq_vae_transformer_arc_welding_tpu.data.asimow import get_data_path


def test_default_data_path(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert get_data_path() == "data"


def test_pleiades_env(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / ".env").write_text("PLEIADES=1\n")
    monkeypatch.delenv("SLURM_JOB_ID", raising=False)
    assert get_data_path() == "/tmp/hahn/"
    monkeypatch.setenv("SLURM_JOB_ID", "123")
    assert get_data_path() == "/tmp/hahn_123/"


def test_env_comments_ignored(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / ".env").write_text("# PLEIADES=1\nOTHER=x\n")
    assert get_data_path() == "data"
