"""Opponent-store transactional integrity: failed snapshots leave no trace.

Reference semantics: opponent_store.py:436-509 — nested transactions with a
filesystem-op rollback registry. This build collapses that to one SQLite
transaction per mutation with weights-on-disk-before-commit; these tests pin
the invariant that matters: a failed add/clone leaves NEITHER a DB row NOR
an entry directory, and a failed result record leaves Elo untouched.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "obs.db"), str(tmp_path / "league"))


@pytest.fixture
def variables():
    model, _ = build_model("mlp", {"hidden_sizes": [8]})
    return model.init(jax.random.key(0),
                      jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)


def add(store, variables, **kw):
    defaults = dict(architecture="mlp", model_params={"hidden_sizes": [8]},
                    created_epoch=0, role=Role.DYNAMIC)
    defaults.update(kw)
    return store.add_entry(variables, **defaults)


class TestAddEntryRollback:
    def test_failed_save_leaves_no_row_and_no_dir(self, store, variables,
                                                  monkeypatch):
        def boom(path, variables, meta=None):
            # create partial on-disk state before failing, like a mid-write
            # crash would
            os.makedirs(path, exist_ok=True)
            raise OSError("disk full")

        monkeypatch.setattr(store, "_save_variables", boom)
        with pytest.raises(OSError, match="disk full"):
            add(store, variables)
        assert store.list_entries() == []
        league_dir = store.league_dir
        assert not any(os.scandir(league_dir)), "entry dir not cleaned up"

    def test_next_add_after_failure_succeeds_with_fresh_id(
            self, store, variables, monkeypatch):
        calls = {"n": 0}
        real = store._save_variables

        def flaky(path, variables, meta=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("transient")
            return real(path, variables, meta)

        monkeypatch.setattr(store, "_save_variables", flaky)
        with pytest.raises(OSError):
            add(store, variables)
        entry = add(store, variables)
        assert entry.id >= 1
        assert os.path.isdir(entry.checkpoint_path)
        # weights are loadable despite the earlier failed attempt
        restored = store.load_variables(entry)
        assert restored is not None

    def test_display_name_and_lineage_assigned(self, store, variables):
        e = add(store, variables)
        assert e.display_name  # themed name pool
        assert e.lineage_group == f"L{e.id}"
        assert e.flavour_facts  # deterministic flavour facts

    def test_explicit_lineage_preserved(self, store, variables):
        e = add(store, variables, lineage_group="L99")
        assert e.lineage_group == "L99"


class TestCloneIndependence:
    def test_clone_weights_are_a_deep_copy(self, store, variables):
        src = add(store, variables)
        clone = store.clone_entry(src.id, role=Role.DYNAMIC, created_epoch=5)
        assert clone.parent_entry_id == src.id
        assert clone.lineage_group == src.lineage_group
        assert clone.checkpoint_path != src.checkpoint_path
        a = store.load_variables(src)
        b = store.load_variables(clone)
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_clone_of_missing_entry_raises(self, store):
        with pytest.raises(KeyError):
            store.clone_entry(12345, role=Role.DYNAMIC, created_epoch=0)


class TestRecordResultIntegrity:
    def test_bad_entry_id_leaves_elo_untouched(self, store, variables):
        a = add(store, variables)
        elo_before = store.get_entry(a.id).elo_rating
        with pytest.raises(Exception):
            store.record_result(a.id, 99999, wins_a=3, wins_b=1, draws=0,
                               epoch=1)
        assert store.get_entry(a.id).elo_rating == elo_before

    def test_get_entry_missing_raises_keyerror(self, store):
        with pytest.raises(KeyError, match="12345"):
            store.get_entry(12345)


class TestRetireVisibility:
    def test_retired_entries_drop_out_of_active_listing(self, store, variables):
        a = add(store, variables)
        b = add(store, variables)
        store.retire_entry(a.id, reason="test")
        active_ids = {e.id for e in store.list_entries()}
        assert active_ids == {b.id}
        retired = store.list_entries(status="retired")
        assert {e.id for e in retired} == {a.id}
        # weights stay on disk for the historical library
        assert os.path.isdir(store.get_entry(a.id).checkpoint_path)


class TestAddEntryLockDiscipline:
    """add_entry must not hold the DB write lock across the (multi-second
    at flagship scale) weight save — regression for the live failure where
    telemetry snapshot/heartbeat writes hit `database is locked` whenever
    the maintenance worker snapshotted the learner."""

    def test_db_writable_by_others_during_weight_save(self, store, variables,
                                                      monkeypatch):
        import sqlite3

        real = store._save_variables
        observed = {}

        def slow_save(path, variables, meta=None):
            # an independent writer (what the trainer's telemetry thread
            # is) must get the write lock immediately while the save runs
            conn = sqlite3.connect(store.db_path, timeout=0.5)
            try:
                conn.execute("BEGIN IMMEDIATE")
                conn.execute(
                    "UPDATE training_state SET current_epoch = 77 WHERE id = 1")
                conn.commit()
                observed["write_ok"] = True
            finally:
                conn.close()
            return real(path, variables, meta)

        monkeypatch.setattr(store, "_save_variables", slow_save)
        entry = add(store, variables)
        assert observed.get("write_ok"), "writer blocked during weight save"
        assert entry.status == "active"

    def test_reader_never_sees_materializing_row(self, store, variables,
                                                 monkeypatch):
        real = store._save_variables
        seen = {}

        def spying_save(path, variables, meta=None):
            seen["listed"] = [e.id for e in store.list_entries()]
            seen["pool_size"] = store.pool_size()
            return real(path, variables, meta)

        first = add(store, variables)
        monkeypatch.setattr(store, "_save_variables", spying_save)
        second = add(store, variables)
        # while the second entry's weights were being written, only the
        # first (committed) entry was visible
        assert seen["listed"] == [first.id]
        assert seen["pool_size"] == 1
        assert {e.id for e in store.list_entries()} == {first.id, second.id}

    def test_historical_and_dashboard_skip_materializing_row(self, store,
                                                             variables):
        """The structural invariant (ADVICE r3 medium): a mid-add
        'materializing' row (blank checkpoint_path) must be invisible to
        HistoricalLibrary._candidates() — a milestone slot snapping onto
        it would hand the gauntlet an unloadable path — and to the
        dashboard's read_league_data() entries payload."""
        from keisei_tpu import db as kdb
        from keisei_tpu.db import core as dbcore
        from keisei_tpu.league.config import HistoricalLibraryConfig
        from keisei_tpu.league.historical import HistoricalLibrary

        keep = add(store, variables)
        conn = dbcore.connect(store.db_path)
        try:
            conn.execute(
                "INSERT INTO league_entries (display_name, architecture, "
                "model_params, checkpoint_path, elo_rating, created_epoch, "
                "role, status, parent_entry_id, lineage_group, "
                "protection_remaining, flavour_facts) VALUES "
                "('', 'mlp', '{}', '', 1000.0, 0, 'dynamic', "
                "'materializing', NULL, NULL, 0, '[]')")
            conn.commit()
        finally:
            conn.close()

        lib = HistoricalLibrary(store, HistoricalLibraryConfig())
        assert [e.id for e in lib._candidates()] == [keep.id]
        data = kdb.read_league_data(store.db_path)
        assert [e["id"] for e in data["entries"]] == [keep.id]

    def test_stranded_materializing_row_swept_at_startup(self, store,
                                                         variables):
        from keisei_tpu.db import core as dbcore

        keep = add(store, variables)
        # simulate a crash between row allocation and activation
        conn = dbcore.connect(store.db_path)
        try:
            cur = conn.execute(
                "INSERT INTO league_entries (display_name, architecture, "
                "model_params, checkpoint_path, elo_rating, created_epoch, "
                "role, status, parent_entry_id, lineage_group, "
                "protection_remaining, flavour_facts) VALUES "
                "('', 'mlp', '{}', '', 1000.0, 0, 'dynamic', "
                "'materializing', NULL, NULL, 0, '[]')")
            orphan_id = int(cur.lastrowid)
            conn.commit()
        finally:
            conn.close()
        orphan_dir = store._entry_dir(orphan_id)
        os.makedirs(orphan_dir, exist_ok=True)

        assert {e.id for e in store.list_entries()} == {keep.id}
        store.reconcile_update_counts()
        assert not os.path.isdir(orphan_dir)
        with pytest.raises(KeyError):
            store.get_entry(orphan_id)
        assert {e.id for e in store.list_entries()} == {keep.id}
