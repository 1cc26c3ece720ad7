"""Config system: TOML parsing, unknown-key rejection, torch-key shims.

The reference treats its config layer as a hard gate (keisei/config.py:
558-759 — unknown keys rejected per section, legacy keys shimmed, cross-
field checks). These tests pin the same behavior for the TOML surface,
including reference config files parsing unchanged.
"""

import pytest

from keisei_tpu.training.config import (
    VALID_ALGORITHMS,
    Config,
    TrainingConfig,
    config_from_dict,
    load_config,
)


class TestSections:
    def test_defaults_from_empty(self):
        cfg = config_from_dict({})
        assert isinstance(cfg, Config)
        assert cfg.training.algorithm in VALID_ALGORITHMS
        assert cfg.league is None

    def test_unknown_section_rejected(self):
        with pytest.raises(ValueError, match="unknown config sections"):
            config_from_dict({"trainnig": {}})

    def test_unknown_key_rejected_with_valid_list(self):
        with pytest.raises(ValueError, match="unknown key 'nope'"):
            config_from_dict({"training": {"nope": 1}})
        with pytest.raises(ValueError, match="valid:"):
            config_from_dict({"model": {"archtype": "mlp"}})

    def test_nested_algorithm_params(self):
        cfg = config_from_dict({"training": {
            "algorithm_params": {"batch_size": 1024, "gamma": 0.98}}})
        assert cfg.algorithm_params.batch_size == 1024
        assert cfg.algorithm_params.gamma == 0.98

    def test_league_section_builds_league_config(self):
        cfg = config_from_dict({"league": {"enabled": True,
                                           "snapshot_interval": 7}})
        assert cfg.league is not None
        assert cfg.league.snapshot_interval == 7


class TestValidation:
    def test_bad_architecture(self):
        with pytest.raises(ValueError, match="unknown architecture"):
            config_from_dict({"model": {"architecture": "gpt5"}})

    def test_bad_algorithm(self):
        with pytest.raises(ValueError, match="unknown algorithm"):
            config_from_dict({"training": {"algorithm": "dqn"}})

    def test_domain_checks(self):
        with pytest.raises(ValueError, match="num_games"):
            TrainingConfig(num_games=0)
        with pytest.raises(ValueError, match="max_ply"):
            TrainingConfig(max_ply=-1)
        with pytest.raises(ValueError, match="observation_mode"):
            TrainingConfig(observation_mode="fancy")
        with pytest.raises(ValueError, match="rollout_forward"):
            TrainingConfig(rollout_forward="cuda")
        with pytest.raises(ValueError, match="checkpoint_interval"):
            TrainingConfig(checkpoint_interval=0)

    def test_effective_steps_default_to_max_ply(self):
        t = TrainingConfig(max_ply=200)
        assert t.effective_steps_per_epoch == 200
        t2 = TrainingConfig(max_ply=200, steps_per_epoch=64)
        assert t2.effective_steps_per_epoch == 64


class TestTomlFiles:
    def test_repo_configs_parse(self):
        """Every committed TOML config must load without error."""
        import glob
        paths = glob.glob("configs/*.toml")
        assert paths, "no committed configs found"
        for p in paths:
            cfg = load_config(p)
            assert cfg.training.num_games > 0

    def test_torch_only_keys_ignored_with_log(self, tmp_path, caplog):
        """Reference config files carry torch-era keys (compile_mode, amp);
        they load with an info log instead of an error."""
        p = tmp_path / "t.toml"
        p.write_text("""
[training]
num_games = 8

[training.algorithm_params]
compile_mode = "default"
batch_size = 64
""")
        import logging
        with caplog.at_level(logging.INFO):
            cfg = load_config(str(p))
        assert cfg.algorithm_params.batch_size == 64
        assert any("torch-only" in r.message for r in caplog.records)
