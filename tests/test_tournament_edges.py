"""LeagueTournament orchestration edges with stubbed match runners.

Covers the host-side decision logic tests/test_tournament.py's end-to-end
runs don't isolate: due-gating, pool partitioning (training-vs-calibration,
architecture mismatch, slot cap, single-pairing fallback), failure isolation
inside a round, the pooled->sequential fallback's no-double-record guarantee,
dynamic-trainer cache reconciliation, and round-stats bookkeeping
(reference tournament.py:129-467 semantics).
"""

import jax
import jax.numpy as jnp
import pytest

from keisei_tpu.db import core as dbcore
from keisei_tpu.league.config import LeagueConfig
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.league.tournament import LeagueTournament
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))


_CACHE = {}


def tiny_vars(hidden=8):
    if hidden not in _CACHE:
        model, _ = build_model("mlp", {"hidden_sizes": [hidden]})
        _CACHE[hidden] = model.init(
            jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
            train=False)
    return _CACHE[hidden]


def add(store, role, hidden=8, epoch=0):
    return store.add_entry(tiny_vars(hidden), architecture="mlp",
                           model_params={"hidden_sizes": [hidden]},
                           created_epoch=epoch, role=role)


def league_cfg(parallel_matches=None, **kw):
    from keisei_tpu.league.config import ConcurrencyConfig
    kw.setdefault("tournament_enabled", True)
    kw.setdefault("tournament_interval_epochs", 2)
    if parallel_matches is not None:
        kw["concurrency"] = ConcurrencyConfig(parallel_matches=parallel_matches)
    return LeagueConfig(**kw)


class TestIsDue:
    def test_gates(self, store):
        t = LeagueTournament(store, league_cfg(), min_pool=3, min_epoch=5)
        for _ in range(3):
            add(store, Role.DYNAMIC)
        assert not t.is_due(4)      # below min epoch
        assert not t.is_due(5)      # 5 % 2 != 0
        assert t.is_due(6)
        t2 = LeagueTournament(store, league_cfg(), min_pool=5, min_epoch=5)
        assert not t2.is_due(6)     # pool too small

    def test_disabled(self, store):
        cfg = league_cfg(tournament_enabled=False)
        t = LeagueTournament(store, cfg, min_pool=0, min_epoch=0)
        assert not t.is_due(100)


class TestPartition:
    def make(self, store, parallel=4):
        return LeagueTournament(store, league_cfg(parallel_matches=parallel))

    def test_training_matches_ride_the_pool(self, store):
        # training pairings pool too (the pool collects their rollouts) —
        # sequential training matches were the dominant round cost
        t = self.make(store)
        d1, d2 = add(store, Role.DYNAMIC), add(store, Role.DYNAMIC)
        f1, f2, f3 = (add(store, Role.FRONTIER_STATIC) for _ in range(3))
        pairings = [(d1, d2), (f1, f2), (f1, f3), (f2, f3)]
        pooled, sequential = t._partition_for_pool(pairings)
        assert (d1, d2) in pooled
        assert len(pooled) == 4 and sequential == []

    def test_arch_mismatch_not_pooled(self, store):
        t = self.make(store)
        f1 = add(store, Role.FRONTIER_STATIC, hidden=8)
        f2 = add(store, Role.FRONTIER_STATIC, hidden=8)
        g1 = add(store, Role.FRONTIER_STATIC, hidden=16)
        pooled, sequential = t._partition_for_pool(
            [(f1, f2), (f1, g1), (f2, g1)])
        # mixed-arch pairings can't share the pool; only one same-arch pair
        # remains -> no batching win -> everything sequential
        assert pooled == []
        assert len(sequential) == 3

    def test_overflow_chunks_instead_of_sequential(self, store):
        # partition no longer caps at the slot count — run_round plays the
        # poolable list in chunks of `parallel_matches`
        t = self.make(store, parallel=2)
        fs = [add(store, Role.FRONTIER_STATIC) for _ in range(4)]
        pairings = [(fs[i], fs[j]) for i in range(4) for j in range(i + 1, 4)]
        pooled, sequential = t._partition_for_pool(pairings)
        assert len(pooled) == len(pairings)
        assert sequential == []

        chunks = []
        orig = t._play_pooled

        def spy(chunk, epoch, recorded=None, seed_salt=0):
            chunks.append(len(chunk))
            return orig(chunk, epoch, recorded, seed_salt=seed_salt)

        t._play_pooled = spy
        stats = t.run_round(epoch=4)
        assert chunks == [2, 2, 2]  # 6 pairings in 3 chunks of parallel=2
        assert stats["pairings_completed"] == 6

    def test_pool_disabled_when_single_slot(self, store):
        t = self.make(store, parallel=1)
        f1, f2 = add(store, Role.FRONTIER_STATIC), add(store, Role.FRONTIER_STATIC)
        pooled, sequential = t._partition_for_pool([(f1, f2)])
        assert pooled == [] and len(sequential) == 1


class TestRoundOrchestration:
    def tournament(self, store, **kw):
        return LeagueTournament(store, league_cfg(parallel_matches=1),
                                min_pool=0, min_epoch=0, **kw)

    def test_failure_isolated_and_stats_written(self, store):
        t = self.tournament(store)
        for _ in range(3):
            add(store, Role.FRONTIER_STATIC)

        calls = {"n": 0}

        def fake_play(a, b, epoch):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("boom")
            return {"games": 4, "plies": 100}

        t._play_pairing = fake_play
        stats = t.run_round(epoch=10)
        assert stats["pairings_requested"] == 3
        assert stats["pairings_completed"] == 2
        assert stats["total_games"] == 8
        rows = dbcore.fetch_all(store.db_path,
                                "SELECT * FROM tournament_stats")
        assert len(rows) == 1 and rows[0]["pairings_completed"] == 2

    def test_pooled_failure_replays_only_unrecorded(self, store):
        t = LeagueTournament(store, league_cfg(parallel_matches=4),
                             min_pool=0, min_epoch=0)
        fs = [add(store, Role.FRONTIER_STATIC) for _ in range(3)]
        del fs

        seq_played = []

        def fake_pooled(pooled, epoch, recorded=None, seed_salt=0):
            # one pairing's result lands before the failure
            a, b = pooled[0]
            recorded.add((a.id, b.id))
            raise RuntimeError("pool died")

        def fake_play(a, b, epoch):
            seq_played.append((a.id, b.id))
            return {"games": 2, "plies": 50}

        t._play_pooled = fake_pooled
        t._play_pairing = fake_play
        stats = t.run_round(epoch=10)
        # 3 pairings total; 1 recorded in the pool, 2 replayed sequentially
        assert len(seq_played) == 2
        assert stats["pairings_completed"] == 2

    def test_round_with_one_entry_noop(self, store):
        t = self.tournament(store)
        add(store, Role.DYNAMIC)
        assert t.run_round(epoch=10) == {"pairings": 0}

    def test_dynamic_cache_reconciled(self, store):
        class FakeDyn:
            def __init__(self):
                self.kept = None

            def retain_only(self, active):
                self.kept = set(active)

            def begin_round(self):
                pass

        dyn = FakeDyn()
        t = self.tournament(store, dynamic_trainer=dyn)
        d = add(store, Role.DYNAMIC)
        add(store, Role.FRONTIER_STATIC)
        t._play_pairing = lambda a, b, epoch: {"games": 1, "plies": 10}
        t.run_round(epoch=10)
        assert dyn.kept == {d.id}

    def test_style_profiling_every_fifth_round(self, store, monkeypatch):
        t = self.tournament(store)
        for _ in range(2):
            add(store, Role.FRONTIER_STATIC)
        t._play_pairing = lambda a, b, epoch: {"games": 1, "plies": 10}

        calls = {"n": 0}

        class FakeProfiler:
            def __init__(self, db_path):
                pass

            def recompute_all(self):
                calls["n"] += 1

        import keisei_tpu.league.style as style_mod
        monkeypatch.setattr(style_mod, "StyleProfiler", FakeProfiler)
        for _ in range(10):
            t.run_round(epoch=10)
        assert calls["n"] == 2  # rounds 5 and 10
