"""Async weight-flush integrity (round-2 review findings).

Pins four failure modes of the league store's background weight flush:
1. a cache miss during the flush window must serve the NEW generation from
   the pending-tree pin, never re-cache stale disk weights under the new key
2. back-to-back async updates must not leak intermediate weights-v<N> dirs
3. a failed flush surfaces on the NEXT update_weights call BEFORE the
   update_count bump (no phantom generation)
4. wait_for_flushes raises on a failed flush instead of exiting clean
Plus: the PPO update rejects batch_size > trajectory (silent n_mb=0), and
the showcase runner caps failed-match replays instead of starving the queue.
"""

import os
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "obs.db"), str(tmp_path / "league"),
                         cache_size=2)


@pytest.fixture
def entry(store):
    model, _ = build_model("mlp", {"hidden_sizes": [8]})
    v = model.init(jax.random.key(0),
                   jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
    return store.add_entry(v, architecture="mlp",
                           model_params={"hidden_sizes": [8]},
                           created_epoch=0, role=Role.DYNAMIC)


def leaf0(tree):
    return np.asarray(jax.tree.leaves(tree)[0])


class TestPendingTreePin:
    def test_cache_miss_during_flush_serves_new_weights(self, store, entry,
                                                        monkeypatch):
        """Evict the seeded cache entry while the flush is still in flight:
        the read must come from the pending pin, not the stale disk path."""
        gate = threading.Event()
        real_save = store._save_variables

        def slow_save(path, variables, meta=None):
            gate.wait(timeout=30)  # hold the flush until the read happens
            real_save(path, variables, meta)

        monkeypatch.setattr(store, "_save_variables", slow_save)
        old = store.load_variables(store.get_entry(entry.id))
        new_vars = jax.tree.map(lambda x: x + 7.0, old)
        store.update_weights(entry.id, new_vars, flush="async")
        # evict everything (cache_size=2): the seed for the new generation
        # is gone, and checkpoint_path still names the OLD weights
        with store._lock:
            store._cache.clear()
        e2 = store.get_entry(entry.id)
        assert e2.update_count == 1
        got = store.load_variables_cached(e2)
        np.testing.assert_allclose(leaf0(got), leaf0(new_vars))
        # bf16 consumers served from the pin too
        got16 = store.load_variables_cached(e2, dtype=jnp.bfloat16)
        np.testing.assert_allclose(leaf0(got16).astype(np.float32),
                                   leaf0(new_vars), rtol=0.01, atol=0.05)
        gate.set()
        store.wait_for_flushes()
        # after the flush lands the pin is dropped and disk serves the new tree
        assert entry.id not in store._pending_trees
        cold = OpponentStore(store.db_path, store.league_dir)
        np.testing.assert_allclose(
            leaf0(cold.load_variables(cold.get_entry(entry.id))),
            leaf0(new_vars))

    def test_back_to_back_updates_keep_exactly_one_grace_generation(
            self, store, entry):
        """GC keeps the committed tree plus ONE superseded generation (so
        stale snapshots from the current round still resolve) and deletes
        everything older — no unbounded weights-v<N> accumulation."""
        old = store.load_variables(store.get_entry(entry.id))
        v1 = jax.tree.map(lambda x: x + 1.0, old)
        v2 = jax.tree.map(lambda x: x + 2.0, old)
        v3 = jax.tree.map(lambda x: x + 3.0, old)
        store.update_weights(entry.id, v1, flush="async")
        store.update_weights(entry.id, v2, flush="async")
        store.update_weights(entry.id, v3, flush="async")
        store.wait_for_flushes()
        e2 = store.get_entry(entry.id)
        assert e2.update_count == 3
        assert e2.checkpoint_path.endswith("weights-v3")
        dirs = sorted(d for d in os.listdir(store._entry_dir(entry.id))
                      if d.startswith("weights"))
        assert dirs == ["weights-v2", "weights-v3"], f"checkpoint dirs: {dirs}"
        np.testing.assert_allclose(
            leaf0(store.load_variables(e2)), leaf0(v3))


class TestFlushFailureSurfacing:
    def _arm_failure(self, store, monkeypatch, fail_times=1):
        calls = {"n": 0}
        real = store._save_variables

        def flaky(path, variables, meta=None):
            calls["n"] += 1
            if calls["n"] <= fail_times:
                raise OSError("disk full")
            real(path, variables, meta)

        monkeypatch.setattr(store, "_save_variables", flaky)
        return calls

    def test_next_update_raises_before_bump(self, store, entry, monkeypatch):
        self._arm_failure(store, monkeypatch)
        old = store.load_variables(store.get_entry(entry.id))
        new_vars = jax.tree.map(lambda x: x + 1.0, old)
        store.update_weights(entry.id, new_vars, flush="async")
        # drain the pool without consuming the error
        store._flush_pool.submit(lambda: None).result()
        count_before = store.get_entry(entry.id).update_count
        with pytest.raises(RuntimeError, match="previous async weight flush"):
            store.update_weights(entry.id, new_vars, flush="async")
        # the failed call must NOT have minted a phantom generation
        assert store.get_entry(entry.id).update_count == count_before

    def test_pending_pin_survives_failed_flush(self, store, entry,
                                               monkeypatch):
        self._arm_failure(store, monkeypatch)
        old = store.load_variables(store.get_entry(entry.id))
        new_vars = jax.tree.map(lambda x: x + 3.0, old)
        store.update_weights(entry.id, new_vars, flush="async")
        store._flush_pool.submit(lambda: None).result()
        with store._lock:
            store._cache.clear()
        got = store.load_variables_cached(store.get_entry(entry.id))
        np.testing.assert_allclose(leaf0(got), leaf0(new_vars))

    def test_wait_for_flushes_raises_on_failure(self, store, entry,
                                                monkeypatch):
        self._arm_failure(store, monkeypatch)
        old = store.load_variables(store.get_entry(entry.id))
        store.update_weights(entry.id, jax.tree.map(lambda x: x + 1.0, old),
                             flush="async")
        with pytest.raises(RuntimeError, match="flush"):
            store.wait_for_flushes()

    def test_sync_flush_raises_inline(self, store, entry, monkeypatch):
        self._arm_failure(store, monkeypatch)
        old = store.load_variables(store.get_entry(entry.id))
        with pytest.raises(OSError, match="disk full"):
            store.update_weights(entry.id,
                                 jax.tree.map(lambda x: x + 1.0, old),
                                 flush="sync")


class TestPPOBatchSizeGuard:
    def test_oversized_batch_size_raises_not_silent(self):
        from keisei_tpu.training.ppo import (
            KataGoPPOParams,
            TrainState,
            Trajectory,
            make_optimizer,
            make_ppo_update,
        )
        from keisei_tpu.training.value_adapter import get_value_adapter

        model, _ = build_model("mlp", {"hidden_sizes": (16,)})
        adapter = get_value_adapter("scalar")
        cfg = KataGoPPOParams(batch_size=4096, epochs_per_batch=1)
        T, N = 2, 4  # 12 samples << 4096 -> zero minibatches
        variables = model.init(jax.random.key(0),
                               jnp.zeros((2, 50, 9, 9)), train=False)
        opt = make_optimizer(cfg)
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=opt.init(variables["params"]),
                           step=jnp.int32(0))
        update = make_ppo_update(model, adapter, cfg, opt)

        S = (T, N)
        traj = Trajectory(
            obs=jnp.zeros(S + (50, 81), jnp.float32),
            actions=jnp.zeros(S, jnp.int32),
            log_probs=jnp.zeros(S, jnp.float32),
            values=jnp.zeros(S, jnp.float32),
            rewards=jnp.zeros(S, jnp.float32),
            dones=jnp.zeros(S, bool),
            terminated=jnp.zeros(S, bool),
            legal_masks=jnp.ones(S + (11259,), bool),
            value_cats=jnp.zeros(S, jnp.int32),
            score_targets=jnp.zeros(S, jnp.float32),
            next_value_override=jnp.full(S, jnp.nan, jnp.float32),
        )
        with pytest.raises(ValueError, match="exceeds the .*-sample"):
            update(state, traj, jnp.zeros((N,), jnp.float32),
                   jax.random.key(1), jnp.float32(0.01))


@pytest.mark.integration
class TestShowcaseReplayCap:
    def test_persistently_failing_match_is_cancelled_not_starving(
            self, tmp_path, monkeypatch):
        """A match whose play fails on every replay must be cancelled after
        MAX_MATCH_REPLAYS, freeing the queue for the next entry."""
        import sqlite3
        import time as _t

        from keisei_tpu.db import showcase as sc
        from keisei_tpu.showcase.runner import MAX_MATCH_REPLAYS, ShowcaseRunner

        db_path = str(tmp_path / "obs.db")
        store = OpponentStore(db_path, str(tmp_path / "league"))
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        for seed in (0, 1):
            v = model.init(jax.random.key(seed),
                           jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
            store.add_entry(v, architecture="mlp",
                            model_params={"hidden_sizes": [16]},
                            created_epoch=0, role=Role.DYNAMIC)
        poison = sc.queue_match(db_path, "1", "2", "fast")
        healthy = sc.queue_match(db_path, "1", "2", "fast")
        runner = ShowcaseRunner(db_path, str(tmp_path / "league"), max_ply=6,
                                auto_showcase=False, store=store)
        calls = {"n": 0}
        real_play = runner.play_match

        def play(row):
            if row["id"] == poison:
                calls["n"] += 1
                raise sqlite3.OperationalError("wedged")
            real_play(row)

        monkeypatch.setattr(runner, "play_match", play)
        import threading

        t = threading.Thread(target=runner.run, daemon=True)
        t.start()
        deadline = _t.monotonic() + 90
        while _t.monotonic() < deadline:
            if (sc.get_queue_status(db_path, poison) == "cancelled"
                    and sc.get_queue_status(db_path, healthy) == "done"):
                break
            _t.sleep(0.2)
        runner.request_stop()
        t.join(timeout=15)
        assert sc.get_queue_status(db_path, poison) == "cancelled"
        assert sc.get_queue_status(db_path, healthy) == "done"
        assert calls["n"] == MAX_MATCH_REPLAYS + 1  # first try + capped replays


class TestCacheByteBudget:
    def test_byte_budget_evicts_lru_first(self, tmp_path):
        """The device LRU enforces an HBM byte budget, not just a count cap
        (flagship fp32 trees would otherwise exhaust the chip as the league
        pool grows — round-2 soak finding)."""
        store = OpponentStore(str(tmp_path / "obs.db"),
                              str(tmp_path / "league"),
                              cache_size=64, cache_bytes=None)
        model, _ = build_model("mlp", {"hidden_sizes": [64]})
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        entries = [store.add_entry(v, architecture="mlp",
                                   model_params={"hidden_sizes": [64]},
                                   created_epoch=0, role=Role.DYNAMIC)
                   for _ in range(4)]
        one_tree = store._tree_nbytes(
            store.load_variables_cached(entries[0]))
        assert one_tree > 0
        # budget for ~2 trees
        store._cache_bytes = int(one_tree * 2.5)
        with store._lock:
            store._cache.clear()
            store._tree_bytes.clear()
        for e in entries:
            store.load_variables_cached(e)
        with store._lock:
            held = list(store._cache)
            total = sum(store._tree_bytes[k] for k in held)
        assert len(held) == 2, held
        assert total <= store._cache_bytes
        # most-recently-used entries survive
        assert {k[0] for k in held} == {entries[2].id, entries[3].id}

    def test_count_cap_still_enforced(self, tmp_path):
        store = OpponentStore(str(tmp_path / "obs.db"),
                              str(tmp_path / "league"),
                              cache_size=2, cache_bytes=None)
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        entries = [store.add_entry(v, architecture="mlp",
                                   model_params={"hidden_sizes": [8]},
                                   created_epoch=0, role=Role.DYNAMIC)
                   for _ in range(3)]
        for e in entries:
            store.load_variables_cached(e)
        assert len(store._cache) == 2

    def test_single_oversized_tree_still_cached(self, tmp_path):
        # a tree bigger than the whole budget must not evict itself into
        # a thrash loop: keep at least one entry
        store = OpponentStore(str(tmp_path / "obs.db"),
                              str(tmp_path / "league"),
                              cache_size=8, cache_bytes=16)  # 16 BYTES
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        e = store.add_entry(v, architecture="mlp",
                            model_params={"hidden_sizes": [8]},
                            created_epoch=0, role=Role.DYNAMIC)
        store.load_variables_cached(e)
        assert len(store._cache) == 1

    def test_natives_evicted_before_bf16(self, tmp_path):
        """fp32 native trees must leave the LRU before bf16 inference trees
        (evicting the cohort costs tunnel re-uploads every epoch)."""
        store = OpponentStore(str(tmp_path / "obs.db"),
                              str(tmp_path / "league"),
                              cache_size=64, cache_bytes=None)
        model, _ = build_model("mlp", {"hidden_sizes": [64]})
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        entries = [store.add_entry(v, architecture="mlp",
                                   model_params={"hidden_sizes": [64]},
                                   created_epoch=0, role=Role.DYNAMIC)
                   for _ in range(3)]
        # oldest-first: native e0, bf16 e0, bf16 e1; then shrink the budget
        # so inserting native e2 must evict — the OLD NATIVE, not the bf16s
        native_sz = store._tree_nbytes(store.load_variables_cached(entries[0]))
        store.load_variables_cached(entries[0], dtype=jnp.bfloat16)
        store.load_variables_cached(entries[1], dtype=jnp.bfloat16)
        bf16_sz = min(v for v in store._tree_bytes.values())
        store._cache_bytes = int(2 * bf16_sz + native_sz * 1.2)
        store.load_variables_cached(entries[2])  # new native: triggers evict
        with store._lock:
            held = list(store._cache)
        tags = [(k[0], k[2]) for k in held]
        assert (entries[0].id, "native") not in tags  # old native evicted
        assert (entries[0].id, "bfloat16") in tags    # bf16 survived
        assert (entries[1].id, "bfloat16") in tags
        assert (entries[2].id, "native") in tags


class TestStaleSnapshotLoads:
    """Review r2: readers holding a pre-update OpponentEntry snapshot must
    still resolve weights after the entry trains (and its old dirs are
    garbage-collected)."""

    def test_one_generation_stale_snapshot_loads_from_grace_dir(
            self, store, entry):
        stale = store.get_entry(entry.id)       # v0: .../weights
        old = store.load_variables(stale)
        v1 = jax.tree.map(lambda x: x + 1.0, old)
        store.update_weights(entry.id, v1, flush="async")
        store.wait_for_flushes()
        # the v0 dir still exists (grace) and serves the v0 tree verbatim
        got = store.load_variables(stale)
        np.testing.assert_allclose(leaf0(got), leaf0(old))

    def test_two_generations_stale_snapshot_retries_fresh_pointer(
            self, store, entry, caplog):
        stale = store.get_entry(entry.id)       # v0: .../weights
        old = store.load_variables(stale)
        v1 = jax.tree.map(lambda x: x + 1.0, old)
        v2 = jax.tree.map(lambda x: x + 2.0, old)
        store.update_weights(entry.id, v1, flush="async")
        store.update_weights(entry.id, v2, flush="async")
        store.wait_for_flushes()
        assert not os.path.isdir(stale.checkpoint_path)  # GC'd by v2's job
        import logging
        with caplog.at_level(logging.WARNING):
            got = store.load_variables(stale)
        # served the newest committed generation instead of crashing
        np.testing.assert_allclose(leaf0(got), leaf0(v2))
        assert any("superseded" in r.message for r in caplog.records)

    def test_missing_entry_dir_still_raises(self, store, entry):
        import shutil
        shutil.rmtree(store._entry_dir(entry.id))
        with pytest.raises(Exception):
            store.load_variables(store.get_entry(entry.id))


class TestReconcileUpdateCounts:
    """Review r2: a crash between the update_count bump and the async disk
    flush mints a generation that exists nowhere; trainer startup clamps
    the count back to the committed on-disk version."""

    def test_lost_flush_clamped(self, store, entry):
        store.bump_update_count(entry.id)        # bump with NO disk write,
        store.bump_update_count(entry.id)        # like a crash mid-window
        assert store.get_entry(entry.id).update_count == 2
        cold = OpponentStore(store.db_path, store.league_dir)
        cold.reconcile_update_counts()
        e = cold.get_entry(entry.id)
        assert e.update_count == 0               # committed path is weights (v0)
        assert e.checkpoint_path.endswith("weights")
        # and the next real update mints v1 cleanly on top
        old = cold.load_variables(e)
        cold.update_weights(entry.id, jax.tree.map(lambda x: x + 1.0, old),
                            flush="sync")
        e2 = cold.get_entry(entry.id)
        assert e2.update_count == 1
        assert e2.checkpoint_path.endswith("weights-v1")

    def test_consistent_counts_untouched(self, store, entry):
        old = store.load_variables(store.get_entry(entry.id))
        store.update_weights(entry.id, jax.tree.map(lambda x: x + 1.0, old),
                             flush="sync")
        store.reconcile_update_counts()
        e = store.get_entry(entry.id)
        assert e.update_count == 1
        assert e.checkpoint_path.endswith("weights-v1")


class TestRequeueWriteFailuresBurnNoBudget:
    def test_failed_requeue_writes_do_not_cancel_the_match(
            self, tmp_path, monkeypatch):
        """Review r2: the replay budget must count actual replays granted,
        not attempts to WRITE the requeue — MAX_MATCH_REPLAYS lock hiccups
        on requeue_entry itself must not cancel a match that was never
        replayed."""
        import sqlite3
        import time as _t

        from keisei_tpu.db import showcase as sc
        from keisei_tpu.showcase import runner as runner_mod
        from keisei_tpu.showcase.runner import MAX_MATCH_REPLAYS, ShowcaseRunner

        db_path = str(tmp_path / "obs.db")
        store = OpponentStore(db_path, str(tmp_path / "league"))
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        for seed in (0, 1):
            v = model.init(jax.random.key(seed),
                           jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
            store.add_entry(v, architecture="mlp",
                            model_params={"hidden_sizes": [16]},
                            created_epoch=0, role=Role.DYNAMIC)
        qid = sc.queue_match(db_path, "1", "2", "fast")
        runner = ShowcaseRunner(db_path, str(tmp_path / "league"), max_ply=6,
                                auto_showcase=False, store=store)
        # fast backoffs so MAX_MATCH_REPLAYS x 5s lock-retry waits don't
        # dominate the test
        real_sleep = _t.sleep
        monkeypatch.setattr(runner_mod.time, "sleep",
                            lambda s: real_sleep(min(s, 0.05)))

        plays = {"n": 0}
        real_play = runner.play_match

        def flaky_play(row):
            plays["n"] += 1
            if plays["n"] == 1:
                raise sqlite3.OperationalError("locked")
            real_play(row)

        monkeypatch.setattr(runner, "play_match", flaky_play)

        requeue_fails = {"n": 0}
        real_requeue = sc.requeue_entry

        def flaky_requeue(dbp, entry_id):
            if requeue_fails["n"] < MAX_MATCH_REPLAYS:
                requeue_fails["n"] += 1
                raise sqlite3.OperationalError("locked")
            real_requeue(dbp, entry_id)

        monkeypatch.setattr(runner_mod.sc, "requeue_entry", flaky_requeue)

        import threading
        t = threading.Thread(target=runner.run, daemon=True)
        t.start()
        deadline = _t.monotonic() + 60
        while _t.monotonic() < deadline:
            if sc.get_queue_status(db_path, qid) == "done":
                break
            real_sleep(0.1)
        runner.request_stop()
        t.join(timeout=15)
        # the match WAS replayed and completed — never cancelled, even
        # though requeue_entry failed MAX_MATCH_REPLAYS times first
        assert sc.get_queue_status(db_path, qid) == "done"
        assert requeue_fails["n"] == MAX_MATCH_REPLAYS
        assert plays["n"] == 2


class TestEmptyBatchStatsSkew:
    """Found live on the TPU: dynamic updates used to persist an empty
    batch_stats collection for batch-stats-free architectures (mlp/scalar);
    restoring such a tree against the learner's template is a hard Orbax
    structure error. The writer no longer persists it; the reader tolerates
    pre-existing trees."""

    def test_legacy_tree_restores_against_batchstats_free_template(
            self, store, entry):
        old = store.load_variables(store.get_entry(entry.id))
        assert "batch_stats" not in old
        legacy = {**jax.tree.map(lambda x: x + 1.0, old), "batch_stats": {}}
        store.update_weights(entry.id, legacy, flush="sync")
        cold = OpponentStore(store.db_path, store.league_dir)
        got = cold.load_variables(cold.get_entry(entry.id), template=old)
        assert "batch_stats" not in got
        np.testing.assert_allclose(leaf0(got), leaf0(old) + 1.0)

    def test_batchful_architectures_unaffected(self, tmp_path):
        """A tree with REAL batch_stats restores through the normal
        template path unchanged."""
        store = OpponentStore(str(tmp_path / "o.db"), str(tmp_path / "lg"))
        params = {"num_blocks": 1, "channels": 8, "se_reduction": 2,
                  "global_pool_channels": 4, "policy_channels": 4,
                  "value_fc_size": 8, "score_fc_size": 8}
        model, _ = build_model("se_resnet", params)
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        entry = store.add_entry(v, architecture="se_resnet",
                                model_params=params,
                                created_epoch=0, role=Role.DYNAMIC)
        got = store.load_variables(store.get_entry(entry.id), template=v)
        assert jax.tree.structure(got) == jax.tree.structure(v)


class TestCrossProcessGenerationKeying:
    """A sidecar (separate store instance — it can never see the trainer's
    _pending_trees) reading between the trainer's update_count bump and the
    flush's pointer swap must not cache the old weights under the new
    (id, count) key — that poisons its cache for the whole generation
    (review r2)."""

    def test_mid_window_read_caches_under_committed_generation(
            self, store, entry, tmp_path):
        from keisei_tpu.db import core as dbcore

        old = store.load_variables(store.get_entry(entry.id))
        # simulate the trainer mid-window: count bumped, pointer not swung
        store.bump_update_count(entry.id)
        sidecar = OpponentStore(store.db_path, store.league_dir)
        snap = sidecar.get_entry(entry.id)
        assert snap.update_count == 1
        got = sidecar.load_variables_cached(snap)
        np.testing.assert_allclose(leaf0(got), leaf0(old))
        # cached under the COMMITTED generation (v0), not the bumped count
        assert (entry.id, 0, "native") in sidecar._cache
        assert (entry.id, 1, "native") not in sidecar._cache
        # now the flush lands: v1 written, pointer swings
        new = jax.tree.map(lambda x: x + 1.0, old)
        v1_path = os.path.join(store._entry_dir(entry.id), "weights-v1")
        store._save_variables(v1_path, new)
        dbcore.execute(
            store.db_path,
            "UPDATE league_entries SET checkpoint_path = ? WHERE id = ?",
            (v1_path, entry.id),
        )
        fresh = sidecar.get_entry(entry.id)
        got2 = sidecar.load_variables_cached(fresh)
        np.testing.assert_allclose(leaf0(got2), leaf0(old) + 1.0)


class TestPinBeforeBump:
    def test_pin_is_visible_before_count_bump_lands(self, store, entry,
                                                    monkeypatch):
        """Any reader that can observe the bumped count in the DB must
        already find the pending-tree pin — i.e. the pin is installed
        BEFORE bump_update_count executes (review r2 ordering fix)."""
        seen = {}
        real_bump = store.bump_update_count

        def checking_bump(entry_id):
            with store._lock:
                seen["pin"] = store._pending_trees.get(entry_id)
            real_bump(entry_id)

        monkeypatch.setattr(store, "bump_update_count", checking_bump)
        old = store.load_variables(store.get_entry(entry.id))
        new = jax.tree.map(lambda x: x + 1.0, old)
        store.update_weights(entry.id, new, flush="sync")
        assert seen["pin"] is not None
        count, tree = seen["pin"]
        assert count == 1  # the generation about to be minted
        np.testing.assert_allclose(leaf0(tree), leaf0(old) + 1.0)


@pytest.mark.integration
class TestDeferredWeightFlush:
    """flush="defer": intermediate dynamic-update generations skip the
    disk write (a full f32 tree through the device tunnel each); the pin
    serves in-process readers, the DB pointer lags, and wait_for_flushes
    lands the newest generation."""

    def _store_entry(self, tmp_path):
        from keisei_tpu.models.registry import build_model

        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "lg"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        entry = store.add_entry(v, architecture="mlp", model_params={},
                                created_epoch=0, role="dynamic")
        return store, model, v, entry

    def _bump_tree(self, v, delta):
        return jax.tree.map(lambda x: x + delta, v)

    def test_defer_pins_serve_readers_and_pointer_lags(self, tmp_path):
        store, model, v, entry = self._store_entry(tmp_path)
        path0 = store.get_entry(entry.id).checkpoint_path
        v1 = self._bump_tree(v, 1.0)
        store.update_weights(entry.id, v1, flush="defer")
        e1 = store.get_entry(entry.id)
        assert e1.update_count == 1
        # pointer still names generation 0 — nothing was written
        assert e1.checkpoint_path == path0
        # in-process reader gets the NEW tree (served from the pin/cache)
        got = store.load_variables_cached(e1)
        a = jax.tree.leaves(got)[0]
        b = jax.tree.leaves(jax.device_put(v1))[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_wait_for_flushes_lands_deferred_generation(self, tmp_path):
        store, model, v, entry = self._store_entry(tmp_path)
        v1 = self._bump_tree(v, 1.0)
        store.update_weights(entry.id, v1, flush="defer")
        store.wait_for_flushes()
        e1 = store.get_entry(entry.id)
        assert e1.checkpoint_path.endswith("weights-v1")
        # a COLD reader (fresh store, simulating another process) now
        # restores the deferred generation from disk
        store2 = OpponentStore(store.db_path, store.league_dir)
        got = store2.load_variables(e1)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(got)[0]),
            np.asarray(jax.tree.leaves(v1)[0]))

    def test_async_flush_supersedes_deferred(self, tmp_path):
        store, model, v, entry = self._store_entry(tmp_path)
        store.update_weights(entry.id, self._bump_tree(v, 1.0), flush="defer")
        v2 = self._bump_tree(v, 2.0)
        store.update_weights(entry.id, v2, flush="async")
        store.wait_for_flushes()
        e = store.get_entry(entry.id)
        assert e.update_count == 2
        assert e.checkpoint_path.endswith("weights-v2")
        assert not store._deferred_flushes  # the deferred gen was dropped

    def test_deferred_pin_cap_spills_oldest(self, tmp_path):
        from keisei_tpu.models.registry import build_model

        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "lg"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        entries = []
        for i in range(6):
            v = model.init(jax.random.key(i),
                           jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
            entries.append((store.add_entry(
                v, architecture="mlp", model_params={}, created_epoch=0,
                role="dynamic"), v))
        for e, v in entries:
            store.update_weights(e.id, jax.tree.map(lambda x: x + 1, v),
                                 flush="defer")
        # cap is 4: the two oldest spilled to async flushes
        assert len(store._deferred_flushes) == 4
        store.wait_for_flushes()
        for e, _ in entries:
            assert store.get_entry(e.id).checkpoint_path.endswith(
                "weights-v1")
