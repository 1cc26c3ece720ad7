"""Direct tests for league_ops: cohort stacking + epoch result recording.

These are the trainer<->league glue functions (reference
katago_loop.py:917-1084 cohort loading, :1676-1698 Elo carry/recording);
previously exercised only indirectly through the league-mode trainer test.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keisei_tpu.league.league_ops import (
    record_epoch_results,
    stack_cohort_variables,
)
from keisei_tpu import db
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "league.db"), str(tmp_path / "league"))


def tiny_variables(seed=0):
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    return model.init(
        jax.random.key(seed), jnp.zeros((1, 50, 9, 9), jnp.float32), train=False
    )


def add(store, seed, role=Role.RECENT_FIXED, epoch=1):
    return store.add_entry(
        tiny_variables(seed), architecture="mlp",
        model_params={"hidden_sizes": [16]}, created_epoch=epoch, role=role,
    )


class FakeScheduler:
    def __init__(self):
        self.calls = []

    def record_learner_result(self, role, won):
        self.calls.append((role, won))


class TestStackCohort:
    def test_stacks_k_entries_with_leading_axis(self, store):
        entries = [add(store, s) for s in range(3)]
        template = tiny_variables()
        stacked = stack_cohort_variables(store, entries, template)
        for leaf in jax.tree.leaves(stacked):
            assert leaf.shape[0] == 3
        # slot k holds entry k's weights, not a broadcast of one entry
        # (bias leaves are zero-init for every seed, so ANY differing leaf
        # proves distinct weights landed in distinct slots)
        assert any(
            not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))
            for leaf in jax.tree.leaves(stacked)
        )

    def test_repeated_entry_cycled_to_fill_k(self, store):
        e = add(store, 7)
        stacked = stack_cohort_variables(store, [e, e, e, e], tiny_variables())
        first = jax.tree.leaves(stacked)[0]
        assert first.shape[0] == 4
        np.testing.assert_array_equal(np.asarray(first[0]), np.asarray(first[3]))

    def test_bf16_stack_halves_dtype_and_preserves_values(self, store):
        """Production stacks opponents in bf16 (loop.py): every float leaf
        lands bf16 and equals the fp32 source rounded to bf16."""
        entries = [add(store, s) for s in range(2)]
        template = tiny_variables()
        s32 = stack_cohort_variables(store, entries, template)
        s16 = stack_cohort_variables(store, entries, template,
                                     dtype=jnp.bfloat16)
        for l32, l16 in zip(jax.tree.leaves(s32), jax.tree.leaves(s16)):
            if jnp.issubdtype(l32.dtype, jnp.floating):
                assert l16.dtype == jnp.bfloat16
                np.testing.assert_array_equal(
                    np.asarray(l32, dtype=jnp.bfloat16), np.asarray(l16))
            else:
                assert l16.dtype == l32.dtype

    def test_batch_stats_normalized_from_template(self, store, monkeypatch):
        """An entry whose checkpoint predates batch_stats (e.g. written by
        an older save path) must still stack against a BN template: the
        template's stats fill the gap so the K-stack has one treedef."""
        e = add(store, 1)
        bare = tiny_variables(1)  # params only, no batch_stats
        monkeypatch.setattr(store, "load_variables_cached",
                            lambda entry, template=None, dtype=None: bare)
        template = dict(tiny_variables())
        template["batch_stats"] = {"bn": {"mean": jnp.zeros((4,))}}
        stacked = stack_cohort_variables(store, [e, e], template)
        assert "batch_stats" in stacked
        assert stacked["batch_stats"]["bn"]["mean"].shape == (2, 4)


def stats(opp_wins, opp_losses, opp_draws):
    return SimpleNamespace(
        opp_wins=np.asarray(opp_wins),
        opp_losses=np.asarray(opp_losses),
        opp_draws=np.asarray(opp_draws),
    )


class TestRecordEpochResults:
    K_ARGS = dict(k_factor=16.0, role_elo_k={
        Role.FRONTIER_STATIC: 16.0, Role.RECENT_FIXED: 32.0,
        Role.DYNAMIC: 24.0,
    })

    def test_repeated_cohort_slots_aggregate(self, store):
        learner = add(store, 0)
        opp = add(store, 1)
        sched = FakeScheduler()
        record_epoch_results(
            store, sched, learner.id, [opp, opp],
            stats([3, 2], [1, 0], [0, 1]), epoch=5, **self.K_ARGS,
        )
        rows = db.read_head_to_head(store.db_path)
        assert len(rows) == 1
        r = rows[0]
        total = r["wins_a"] + r["wins_b"] + r["draws"]
        assert total == 7  # 5 wins + 1 loss + 1 draw, both slots pooled
        # ONE scheduler sample per distinct opponent, not per slot
        assert sched.calls == [(opp.role, True)]

    def test_zero_game_slots_skipped(self, store):
        learner = add(store, 0)
        a, b = add(store, 1), add(store, 2)
        sched = FakeScheduler()
        record_epoch_results(
            store, sched, learner.id, [a, b],
            stats([2, 0], [1, 0], [0, 0]), epoch=3, **self.K_ARGS,
        )
        assert len(db.read_head_to_head(store.db_path)) == 1  # only `a` played
        assert len(sched.calls) == 1

    def test_self_pairing_carries_no_elo(self, store):
        learner = add(store, 0)
        sched = FakeScheduler()
        before = store.get_entry(learner.id).elo_rating
        record_epoch_results(
            store, sched, learner.id, [learner],
            stats([4], [1], [0]), epoch=2, **self.K_ARGS,
        )
        assert store.get_entry(learner.id).elo_rating == before
        assert db.read_head_to_head(store.db_path) == []
        assert sched.calls == []

    def test_elo_moves_toward_winner(self, store):
        learner = add(store, 0)
        opp = add(store, 1)
        record_epoch_results(
            store, FakeScheduler(), learner.id, [opp],
            stats([5], [0], [0]), epoch=2, **self.K_ARGS,
        )
        assert store.get_entry(learner.id).elo_rating > 1000.0
        assert store.get_entry(opp.id).elo_rating < 1000.0

    def test_one_bad_opponent_does_not_abort_others(self, store, monkeypatch):
        """Recording is per-opponent non-fatal (telemetry policy)."""
        learner = add(store, 0)
        a, b = add(store, 1), add(store, 2)
        real = store.record_result

        def flaky(eid_a, eid_b, **kw):
            if eid_b == a.id:
                raise RuntimeError("injected")
            return real(eid_a, eid_b, **kw)

        monkeypatch.setattr(store, "record_result", flaky)
        sched = FakeScheduler()
        record_epoch_results(
            store, sched, learner.id, [a, b],
            stats([1, 2], [0, 1], [0, 0]), epoch=4, **self.K_ARGS,
        )
        rows = db.read_head_to_head(store.db_path)
        assert len(rows) == 1  # b's result landed despite a's failure
        assert len(sched.calls) == 1
