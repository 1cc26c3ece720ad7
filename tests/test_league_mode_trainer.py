"""End-to-end league-mode training: cohort rollouts, Elo, snapshots."""

import copy

import numpy as np
import pytest

from keisei_tpu import db
from keisei_tpu.training.config import config_from_dict
from keisei_tpu.training.loop import SelfPlayTrainer

RAW = {
    "model": {
        "display_name": "tiny-league",
        "architecture": "mlp",
        "params": {"hidden_sizes": [16]},
    },
    "training": {
        "num_games": 4,
        "max_ply": 24,
        "steps_per_epoch": 12,
        "checkpoint_interval": 100,
        "checkpoint_dir": "UNSET",
        "algorithm_params": {"batch_size": 13, "epochs_per_batch": 1},
    },
    "run": {"default_epochs": 3},
    "league": {
        "enabled": True,
        "opponents_per_epoch": 2,
        "snapshot_interval": 2,
        "epochs_per_seat": 100,
        "tournament_enabled": False,
        "storage": {"league_dir": "UNSET"},
        "recent": {"slots": 3, "min_games_for_review": 0,
                   "min_unique_opponents": 0},
        "dynamic": {"slots": 3, "min_games_before_eviction": 0},
        "history": {"refresh_interval_epochs": 2, "min_epoch_for_selection": 1},
        "gauntlet": {"interval_epochs": 2, "games_per_matchup": 2},
    },
}


@pytest.mark.integration
class TestLeagueModeTrainer:
    def test_three_epochs_league(self, tmp_path):
        raw = copy.deepcopy(RAW)
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        raw["league"]["storage"]["league_dir"] = str(tmp_path / "league")
        raw["display"] = {"db_path": str(tmp_path / "obs.db")}
        cfg = config_from_dict(raw)
        trainer = SelfPlayTrainer(cfg)
        assert trainer.league_enabled
        # bootstrap snapshot created an entry
        assert trainer.store.pool_size() >= 1

        trainer.observer.on_start(cfg, total_epochs=3)
        for _ in range(3):
            em = trainer.run_epoch()
            assert np.isfinite(em.policy_loss)

        # snapshots at epoch 2 (interval=2) grew the pool
        assert trainer.store.pool_size() >= 2
        entries = trainer.store.list_entries()
        assert all(e.architecture == "mlp" for e in entries)

        # elo history carried forward every epoch
        hist = db.read_elo_history(trainer.store.db_path)
        assert len(hist) >= trainer.store.pool_size()

        # learner entry id tracked in training_state
        st = db.read_training_state(str(tmp_path / "obs.db"))
        assert st["learner_entry_id"] == trainer.learner_entry_id

        # league results recorded once real opponents existed
        data = db.read_league_data(trainer.store.db_path)
        assert isinstance(data["results"], list)

    @pytest.mark.slow
    def test_gauntlet_and_history_fire(self, tmp_path):
        raw = copy.deepcopy(RAW)
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        raw["league"]["storage"]["league_dir"] = str(tmp_path / "league")
        raw["display"] = {"db_path": str(tmp_path / "obs.db")}
        cfg = config_from_dict(raw)
        trainer = SelfPlayTrainer(cfg)
        trainer.run_epoch()
        trainer.run_epoch()  # epoch 2: history refresh + gauntlet due
        # async_maintenance (default) queues the refresh/gauntlet on the
        # worker; drain_maintenance() is the documented visibility point
        # (loop.py:991) — without it this assert races the worker thread
        trainer.drain_maintenance()
        slots = db.read_historical_slots(trainer.store.db_path)
        assert slots, "historical library never refreshed"
        rows = db.connect(trainer.store.db_path).execute(
            "SELECT COUNT(*) FROM gauntlet_results"
        ).fetchone()[0]
        assert rows >= 1

    def test_cohort_swap_resets_swapped_blocks_only(self, tmp_path):
        """A game straddling an epoch boundary must not switch opponents
        mid-game: when cohort slot k changes entries, block k's envs are
        restarted (truncation semantics) and the other blocks continue.
        (The reference instead reassigns every env and accepts the Elo
        misattribution, katago_loop.py:1057-1060.)"""
        import jax.numpy as jnp

        raw = copy.deepcopy(RAW)
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        raw["league"]["storage"]["league_dir"] = str(tmp_path / "league")
        raw["display"] = {"db_path": str(tmp_path / "obs.db")}
        cfg = config_from_dict(raw)
        trainer = SelfPlayTrainer(cfg)
        trainer.run_epoch()  # envs now mid-game with nonzero ply counts
        states, obs, mask = trainer.env_carry
        ply_before = np.asarray(states.ply)
        N, K = 4, 2
        B = N // K
        assert (ply_before > 0).any(), "rollout left no game in progress"

        trainer._reset_swapped_blocks([1])  # slot 1 = envs [2, 4)
        states2, obs2, mask2 = trainer.env_carry
        ply_after = np.asarray(states2.ply)
        # swapped block restarted; untouched block carries on
        assert (ply_after[B:] == 0).all()
        np.testing.assert_array_equal(ply_after[:B], ply_before[:B])
        # the compact color invariant is restored for the reset envs
        from keisei_tpu.training.league_rollout import parity_colors

        expect = np.asarray(parity_colors(N))
        got = np.asarray(trainer.learner_color)
        np.testing.assert_array_equal(got[B:], expect[B:])
        # fresh board -> startpos observation/mask for the reset block
        init_states, init_obs, init_mask = trainer.env_core.init()
        np.testing.assert_array_equal(np.asarray(obs2[B:]),
                                      np.asarray(init_obs[:N - B]))
        np.testing.assert_array_equal(np.asarray(mask2[B:]),
                                      np.asarray(init_mask[:N - B]))

    def test_run_epoch_triggers_reset_on_slot_change(self, tmp_path):
        """run_epoch detects per-slot entry-id changes and resets exactly
        those blocks before the rollout."""
        raw = copy.deepcopy(RAW)
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        raw["league"]["storage"]["league_dir"] = str(tmp_path / "league")
        raw["display"] = {"db_path": str(tmp_path / "obs.db")}
        cfg = config_from_dict(raw)
        trainer = SelfPlayTrainer(cfg)
        trainer.run_epoch()
        assert trainer._cohort_slot_ids is not None
        calls = []
        orig = trainer._reset_swapped_blocks
        trainer._reset_swapped_blocks = lambda slots: (calls.append(slots),
                                                       orig(slots))
        # force a detectable swap in slot 0 only
        trainer._cohort_slot_ids = (-1, trainer._cohort_slot_ids[1])
        sampled = trainer._sample_cohort()
        trainer._sample_cohort = lambda: sampled  # deterministic resample
        trainer.run_epoch()
        assert calls and calls[0] == [0]
