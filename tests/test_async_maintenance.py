"""Background maintenance workers (VERDICT r2 #1): async periodic
checkpoints and the league maintenance FIFO.

The reference keeps maintenance off the training path with a daemon
tournament thread and a second GPU (tournament.py:129,
keisei-500k-league.toml:80-88); here the equivalents are two single-worker
executors whose synchronization point is SelfPlayTrainer.drain_maintenance.
"""

import os

import numpy as np
import pytest

from keisei_tpu.training.config import config_from_dict
from keisei_tpu.training.loop import SelfPlayTrainer


def _raw(tmp_path, **training_extra):
    return {
        "model": {"architecture": "mlp", "params": {"hidden_sizes": [16]}},
        "training": {
            "num_games": 4, "max_ply": 24, "steps_per_epoch": 3,
            "checkpoint_interval": 1,
            "checkpoint_dir": str(tmp_path / "ck") + "/",
            "algorithm_params": {"batch_size": 8, "epochs_per_batch": 1},
            **training_extra,
        },
        "run": {"default_epochs": 2},
    }


def _league_raw(tmp_path, **league_extra):
    raw = _raw(tmp_path, checkpoint_interval=1000)
    raw["league"] = {
        "enabled": True, "opponents_per_epoch": 2, "snapshot_interval": 1,
        "epochs_per_seat": 100, "tournament_enabled": False,
        "storage": {"league_dir": str(tmp_path / "lg") + "/"},
        **league_extra,
    }
    return raw


class TestAsyncCheckpoint:
    def test_epoch_saves_land_after_drain_and_resume_works(self, tmp_path):
        trainer = SelfPlayTrainer(config_from_dict(_raw(tmp_path)))
        for _ in range(3):
            trainer.run_epoch()
        trainer.drain_maintenance()
        ck = tmp_path / "ck"
        epochs = sorted(n for n in os.listdir(ck) if n.startswith("epoch_"))
        assert epochs == ["epoch_000001", "epoch_000002", "epoch_000003"]
        # no stray Orbax tmp dirs survive the drain
        assert not [n for n in os.listdir(ck) if "tmp" in n]
        t2 = SelfPlayTrainer(config_from_dict(_raw(tmp_path)))
        assert t2.epoch == 3

    def test_async_saves_are_donation_safe(self, tmp_path):
        """Interleave async saves with updates that donate the TrainState:
        every checkpoint must hold the weights of ITS epoch, not a buffer
        the next update recycled. The device-side copy in save() is what
        this pins down."""
        trainer = SelfPlayTrainer(config_from_dict(_raw(tmp_path)))
        import jax

        want = {}
        for i in range(3):
            trainer.run_epoch()
            # reference value read synchronously from the live state
            want[i + 1] = float(
                sum(np.abs(np.asarray(jax.device_get(x))).sum()
                    for x in jax.tree.leaves(trainer.state.params))
            )
        trainer.drain_maintenance()
        from keisei_tpu.training.checkpoint import load_checkpoint

        for ep, expected in want.items():
            st, meta, _ = load_checkpoint(
                os.path.join(str(tmp_path / "ck"), f"epoch_{ep:06d}"),
                trainer.state, architecture="mlp",
            )
            got = float(
                sum(np.abs(np.asarray(jax.device_get(x))).sum()
                    for x in jax.tree.leaves(st.params))
            )
            assert got == pytest.approx(expected, rel=1e-6), (
                f"epoch {ep}: checkpoint diverged from live state"
            )

    def test_sync_mode_is_durable_immediately(self, tmp_path):
        raw = _raw(tmp_path, async_checkpoint=False)
        trainer = SelfPlayTrainer(config_from_dict(raw))
        trainer.run_epoch()
        assert (tmp_path / "ck" / "epoch_000001" / "keisei_meta.json").exists()

    def test_explicit_save_is_blocking(self, tmp_path):
        trainer = SelfPlayTrainer(config_from_dict(_raw(tmp_path)))
        trainer.run_epoch()  # queues an async save for epoch 1
        path = trainer.save(str(tmp_path / "ck" / "manual"))
        assert os.path.isfile(os.path.join(path, "keisei_meta.json"))
        # the explicit save also drained the queued epoch save before it
        assert (tmp_path / "ck" / "epoch_000001" / "keisei_meta.json").exists()


class TestAsyncLeagueMaintenance:
    def test_snapshots_land_fifo_and_match_live_weights(self, tmp_path):
        trainer = SelfPlayTrainer(config_from_dict(_league_raw(tmp_path)))
        assert trainer._maint_executor is not None
        base_pool = trainer.store.pool_size()
        trainer.run_epoch()
        trainer.run_epoch()
        trainer.drain_maintenance()
        # snapshot_interval=1 -> one snapshot per epoch, in order
        assert trainer.store.pool_size() == base_pool + 2
        entries = trainer.store.list_entries()
        newest = max(entries, key=lambda e: (e.created_epoch, e.id))
        assert newest.created_epoch == 2
        assert trainer.learner_entry_id == newest.id
        # the epoch-2 snapshot carries the weights of epoch 2's live state
        import jax

        vars_disk = trainer.store.load_variables(newest)
        live = jax.device_get(trainer._variables())
        for a, b in zip(jax.tree.leaves(vars_disk), jax.tree.leaves(live)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_sync_mode_has_no_worker_and_is_immediate(self, tmp_path):
        raw = _league_raw(tmp_path, async_maintenance=False)
        trainer = SelfPlayTrainer(config_from_dict(raw))
        assert trainer._maint_executor is None
        base_pool = trainer.store.pool_size()
        trainer.run_epoch()
        assert trainer.store.pool_size() == base_pool + 1  # no drain needed

    def test_worker_survives_maintenance_failure(self, tmp_path, caplog):
        """The non-fatal policy holds on the worker: a store blowing up in
        one epoch's maintenance must not kill later epochs' tasks."""
        trainer = SelfPlayTrainer(config_from_dict(_league_raw(tmp_path)))
        boom = {"n": 0}
        orig = trainer.pool.snapshot_learner

        def exploding(*a, **kw):
            boom["n"] += 1
            if boom["n"] == 1:
                raise RuntimeError("injected snapshot failure")
            return orig(*a, **kw)

        trainer.pool.snapshot_learner = exploding
        trainer.run_epoch()  # snapshot fails on the worker, logged
        trainer.run_epoch()  # next snapshot succeeds
        trainer.drain_maintenance()
        assert boom["n"] == 2
        newest = max(trainer.store.list_entries(),
                     key=lambda e: (e.created_epoch, e.id))
        assert newest.created_epoch == 2

    def test_backlog_blocks_instead_of_growing(self, tmp_path):
        """When maintenance runs slower than training, the queue must not
        grow without bound (each queued snapshot pins a device-side copy
        of the parameters): at 4 queued epochs the trainer blocks until
        the worker drains."""
        import time as _time

        trainer = SelfPlayTrainer(config_from_dict(_league_raw(tmp_path)))
        orig = trainer._league_maintenance

        def slow(*a, **kw):
            _time.sleep(0.5)
            return orig(*a, **kw)

        trainer._league_maintenance = slow
        for _ in range(8):
            trainer.run_epoch()
            assert len(trainer._maint_futures) <= 4
        trainer.drain_maintenance()
        # every epoch's snapshot was still processed, in order (tier
        # reviews may retire overflow, so assert on the newest entry, not
        # the active count)
        newest = max(trainer.store.list_entries(),
                     key=lambda e: (e.created_epoch, e.id))
        assert newest.created_epoch == 8
        assert trainer.learner_entry_id == newest.id

    def test_run_teardown_drains_everything(self, tmp_path):
        raw = _league_raw(tmp_path)
        raw["training"]["checkpoint_interval"] = 2
        trainer = SelfPlayTrainer(config_from_dict(raw))
        trainer.run(num_epochs=2)
        # no drain call: run() itself must have flushed snapshots + saves
        assert trainer.store.pool_size() >= 3  # bootstrap + 2 snapshots
        ck = tmp_path / "ck"
        assert (ck / "epoch_000002" / "keisei_meta.json").exists()
        assert not trainer._maint_futures


class TestMaintenancePhaseTelemetry:
    def test_phase_seconds_accumulate_and_cover_known_phases(self, tmp_path):
        """_maint_phase_s attributes worker time to named phases — the
        amortized harness (scripts/measure_amortized.py) dumps it so a slow
        worker is diagnosable instead of a single opaque busy total."""
        trainer = SelfPlayTrainer(config_from_dict(_league_raw(tmp_path)))
        trainer.run_epoch()
        trainer.run_epoch()
        trainer.drain_maintenance()
        phases = trainer._maint_phase_s
        # every named phase ran (snapshot_interval=1 in the fixture)
        for key in ("record_results", "snapshot", "elo_review",
                    "historical_gauntlet", "tournament"):
            assert key in phases, f"missing phase {key}: {phases}"
            assert phases[key] >= 0.0
        # phase sum is bounded by the worker's total busy time
        assert sum(phases.values()) <= trainer._maint_busy_s + 1e-6


class TestTournamentOverlapPolicy:
    """Round-5: single-chip tournament rounds BLOCK training
    (tournament_overlap="auto" + no tournament_device) — overlapped, the
    round's device work serializes behind the next epochs' queued
    programs. With a dedicated device (or "always") the round overlaps."""

    def _trainer(self, tmp_path, **league_extra):
        raw = _league_raw(tmp_path, tournament_enabled=True,
                          tournament_num_envs=2, **league_extra)
        return SelfPlayTrainer(config_from_dict(raw))

    def test_auto_blocks_on_shared_device(self, tmp_path):
        trainer = self._trainer(tmp_path, tournament_interval_epochs=1)
        assert trainer.tournament is not None
        assert trainer.tournament.device is None
        assert trainer._tournament_blocks()
        # pool >= min_pool so rounds actually fire
        for seed in (1, 2):
            trainer.pool.snapshot_learner(
                trainer._variables_host(), "mlp",
                dict(trainer.config.model.params), 0)
        for _ in range(6):
            trainer.run_epoch()
            if trainer.tournament.is_due(trainer.epoch):
                # the blocking drain leaves no queued maintenance behind
                assert not trainer._maint_futures
        trainer.drain_maintenance()
        assert trainer.tournament.rounds_played >= 1

    def test_always_overlaps(self, tmp_path):
        trainer = self._trainer(tmp_path, tournament_overlap="always")
        assert not trainer._tournament_blocks()

    def test_auto_overlaps_with_dedicated_device(self, tmp_path):
        trainer = self._trainer(tmp_path)
        import jax

        trainer.tournament.device = jax.devices()[1]
        assert not trainer._tournament_blocks()

    def test_never_blocks_even_with_device(self, tmp_path):
        trainer = self._trainer(tmp_path, tournament_overlap="never")
        import jax

        trainer.tournament.device = jax.devices()[1]
        assert trainer._tournament_blocks()

    def test_bad_overlap_value_rejected(self, tmp_path):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="tournament_overlap"):
            self._trainer(tmp_path, tournament_overlap="sometimes")
