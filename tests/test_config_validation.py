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


class TestLeagueSubConfigValidation:
    """Every league sub-config rejects out-of-domain values with a targeted
    error (reference config.py:46-523 validation discipline)."""

    CASES = [
        # (sub-section or None for top-level, bad kv, error fragment)
        ("frontier", {"slots": 0}, "frontier.slots"),
        ("frontier", {"topk": 0}, "frontier.topk"),
        ("frontier", {"review_interval_epochs": 0}, "review_interval"),
        ("frontier", {"replace_policy": "lifo"}, "replace_policy"),
        ("recent", {"slots": 0}, "recent.slots"),
        ("recent", {"min_games_for_review": -1}, "min_games_for_review"),
        ("dynamic", {"slots": 0}, "dynamic.slots"),
        ("dynamic", {"lr_scale": 0.0}, "lr_scale"),
        ("dynamic", {"lr_scale": 1.5}, "lr_scale"),
        ("dynamic", {"grad_clip": 0.0}, "grad_clip"),
        ("dynamic", {"update_every_matches": 0}, "update_every_matches"),
        ("dynamic", {"max_consecutive_errors": 0}, "max_consecutive_errors"),
        ("scheduler", {"dynamic_dynamic_weight": 0.9}, "sum to 1.0"),
        ("scheduler", {"tournament_mode": "swiss"}, "tournament_mode"),
        ("scheduler", {"min_coverage_ratio": 1.5}, "min_coverage_ratio"),
        ("history", {"slots": 0}, "history.slots"),
        ("history", {"selection": "linear"}, "selection"),
        ("history", {"active_league_participation": True}, "never join"),
        ("gauntlet", {"interval_epochs": 0}, "gauntlet.interval_epochs"),
        ("gauntlet", {"games_per_matchup": 0}, "games_per_matchup"),
        ("elo", {"frontier_k": 0.0}, "frontier_k"),
        ("elo", {"historical_k": -1.0}, "historical_k"),
        ("priority", {"repeat_penalty": 0.5}, "penalties must be <= 0"),
        ("priority", {"uncertainty_weight": float("nan")}, "finite"),
        ("concurrency", {"parallel_matches": 0}, "parallel_matches"),
        ("concurrency", {"envs_per_match": 0}, "envs_per_match"),
        ("storage", {"cache_entries": 0}, "cache_entries"),
        ("storage", {"cache_bytes_gb": 0.0}, "cache_bytes_gb"),
        (None, {"mode": "pure"}, "mixed"),
        (None, {"snapshot_interval": 0}, "snapshot_interval"),
        (None, {"epochs_per_seat": 0}, "epochs_per_seat"),
        (None, {"elo_floor": 5000.0}, "elo_floor"),
        (None, {"opponents_per_epoch": 0}, "opponents_per_epoch"),
        (None, {"per_env_opponents": False}, "per_env_opponents"),
        (None, {"tournament_mode": "thread"}, "tournament_mode"),
        (None, {"tournament_interval_epochs": 0}, "tournament_interval"),
    ]

    @pytest.mark.parametrize("section,bad,frag", CASES,
                             ids=[f"{s or 'league'}-{list(b)[0]}"
                                  for s, b, f in CASES])
    def test_rejected(self, section, bad, frag):
        league = {"enabled": True}
        if section is None:
            league.update(bad)
        else:
            league[section] = bad
        with pytest.raises(ValueError, match=frag.replace("(", "\\(")):
            config_from_dict({"league": league})
