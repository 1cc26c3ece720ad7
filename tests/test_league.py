"""League foundation: opponent store, Elo, match play, evaluation math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu import db
from keisei_tpu.league import (
    EntryStatus,
    OpponentStore,
    Role,
    compute_elo_update,
    elo_delta,
    play_match,
    wilson_interval,
)
from keisei_tpu.league.evaluate import EvalResult
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "league.db"), str(tmp_path / "league"))


def tiny_model():
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32), train=False
    )
    return model, variables


class TestElo:
    def test_symmetric_update(self):
        a, b = compute_elo_update(1000.0, 1000.0, 1.0, k=32)
        assert a == pytest.approx(1016.0) and b == pytest.approx(984.0)
        # zero-sum
        assert a + b == pytest.approx(2000.0)

    def test_draw_between_unequal(self):
        a, b = compute_elo_update(1200.0, 1000.0, 0.5, k=32)
        assert a < 1200.0 and b > 1000.0

    def test_elo_delta_monotonic(self):
        assert elo_delta(0.5) == pytest.approx(0.0)
        assert elo_delta(0.64) == pytest.approx(100.0, abs=2.0)
        assert elo_delta(0.36) == pytest.approx(-100.0, abs=2.0)

    def test_wilson_interval(self):
        lo, hi = wilson_interval(0.6, 100)
        assert 0.49 < lo < 0.6 < hi < 0.7
        assert wilson_interval(0.5, 0) == (0.0, 1.0)


class TestOpponentStore:
    def test_add_and_load_roundtrip(self, store):
        _, variables = tiny_model()
        e = store.add_entry(
            variables, architecture="mlp", model_params={"hidden_sizes": [16]},
            created_epoch=3, role=Role.RECENT_FIXED,
        )
        assert e.id == 1 and e.role == Role.RECENT_FIXED
        assert e.display_name  # deterministic themed name
        assert e.display_name == store.get_entry(e.id).display_name
        loaded = store.load_variables(e, template=variables)
        for x, y in zip(jax.tree.leaves(variables), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_lru_cache_keyed_by_update_count(self, store):
        _, variables = tiny_model()
        e = store.add_entry(
            variables, architecture="mlp", model_params={}, created_epoch=0,
        )
        v1 = store.load_variables_cached(e, template=variables)
        assert store.load_variables_cached(e, template=variables) is v1
        # retraining bumps update_count -> cache miss
        new_vars = jax.tree.map(lambda x: x + 1, variables)
        store.update_weights(e.id, new_vars)
        e2 = store.get_entry(e.id)
        assert e2.update_count == 1
        v2 = store.load_variables_cached(e2, template=variables)
        assert v2 is not v1

    def test_update_weights_seeds_device_cache(self, store, monkeypatch):
        """The post-update (id, count+1) load must be served from the seeded
        LRU — no Orbax restore round trip for weights that never left the
        device."""
        _, variables = tiny_model()
        e = store.add_entry(
            variables, architecture="mlp", model_params={}, created_epoch=0,
        )
        new_vars = jax.tree.map(lambda x: x + 1, variables)
        store.update_weights(e.id, new_vars)
        def boom(*a, **k):
            raise AssertionError("disk restore after update_weights")
        monkeypatch.setattr(store, "load_variables", boom)
        got = store.load_variables_cached(store.get_entry(e.id),
                                          template=variables)
        for x, y in zip(jax.tree.leaves(new_vars), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_update_weights_async_flush_lands_on_disk(self, store):
        _, variables = tiny_model()
        e = store.add_entry(
            variables, architecture="mlp", model_params={}, created_epoch=0,
        )
        new_vars = jax.tree.map(lambda x: x + 2, variables)
        store.update_weights(e.id, new_vars, flush="async")
        store.wait_for_flushes()
        # fresh store (cold cache) must read the flushed tree from disk
        from keisei_tpu.league.store import OpponentStore
        cold = OpponentStore(store.db_path, store.league_dir)
        got = cold.load_variables(cold.get_entry(e.id), template=variables)
        for x, y in zip(jax.tree.leaves(new_vars), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_async_flush_error_surfaces_on_next_update(self, store, monkeypatch):
        _, variables = tiny_model()
        e = store.add_entry(
            variables, architecture="mlp", model_params={}, created_epoch=0,
        )
        def boom(*a, **k):
            raise OSError("disk full")
        monkeypatch.setattr(store, "_save_variables", boom)
        store.update_weights(e.id, variables, flush="async")  # queued, fails
        # drain WITHOUT consuming the error (wait_for_flushes would raise it)
        store._flush_pool.submit(lambda: None).result()
        monkeypatch.undo()
        with pytest.raises(RuntimeError, match="async weight flush"):
            store.update_weights(e.id, variables, flush="async")
        # the error is consumed: the retry itself succeeds
        store.update_weights(e.id, variables, flush="async")
        store.wait_for_flushes()

    def test_bf16_cached_load_serves_half_size_inference_tree(self, store, monkeypatch):
        import jax.numpy as jnp
        _, variables = tiny_model()
        e = store.add_entry(
            variables, architecture="mlp", model_params={}, created_epoch=0,
        )
        v16 = store.load_variables_cached(e, template=variables,
                                          dtype="bfloat16")
        for leaf in jax.tree.leaves(v16):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.bfloat16
        # cache hit: identity
        assert store.load_variables_cached(e, dtype="bfloat16") is v16
        # native and bf16 coexist under distinct keys
        v32 = store.load_variables_cached(e, template=variables)
        assert jax.tree.leaves(v32)[0].dtype == jnp.float32

    def test_bf16_request_cast_from_native_cache_without_disk(self, store, monkeypatch):
        _, variables = tiny_model()
        e = store.add_entry(
            variables, architecture="mlp", model_params={}, created_epoch=0,
        )
        import jax.numpy as jnp
        new_vars = jax.tree.map(lambda x: x + 3, variables)
        store.update_weights(e.id, new_vars)  # seeds native cache
        def boom(*a, **k):
            raise AssertionError("disk restore despite native cache")
        monkeypatch.setattr(store, "load_variables", boom)
        v16 = store.load_variables_cached(store.get_entry(e.id),
                                          dtype="bfloat16")
        for x, y in zip(jax.tree.leaves(new_vars), jax.tree.leaves(v16)):
            np.testing.assert_array_equal(
                np.asarray(x, dtype=jnp.bfloat16), np.asarray(y))

    def test_clone_preserves_lineage(self, store):
        _, variables = tiny_model()
        src = store.add_entry(
            variables, architecture="mlp", model_params={}, created_epoch=0,
        )
        clone = store.clone_entry(src.id, role=Role.DYNAMIC, created_epoch=5,
                                  protection_remaining=3)
        assert clone.parent_entry_id == src.id
        assert clone.lineage_group == src.lineage_group
        assert clone.role == Role.DYNAMIC
        assert clone.protection_remaining == 3

    def test_role_and_retire_transitions_logged(self, store):
        _, variables = tiny_model()
        e = store.add_entry(variables, architecture="mlp", model_params={},
                            created_epoch=0)
        store.update_role(e.id, Role.FRONTIER_STATIC, reason="promotion")
        store.retire_entry(e.id, reason="overflow")
        assert store.get_entry(e.id).status == EntryStatus.RETIRED
        assert store.list_entries() == []
        data = db.read_league_data(store.db_path)
        reasons = {t["reason"] for t in data["transitions"]}
        assert {"promotion", "overflow"} <= reasons

    def test_record_result_transactional(self, store):
        _, variables = tiny_model()
        a = store.add_entry(variables, architecture="mlp", model_params={},
                            created_epoch=0, role=Role.DYNAMIC)
        b = store.add_entry(variables, architecture="mlp", model_params={},
                            created_epoch=0, role=Role.RECENT_FIXED)
        new_a, new_b = store.record_result(
            a.id, b.id, epoch=7, wins_a=5, wins_b=2, draws=1,
        )
        assert new_a > 1000.0 > new_b
        ea, eb = store.get_entry(a.id), store.get_entry(b.id)
        assert ea.elo_rating == pytest.approx(new_a)
        assert ea.games_played == 8 and eb.games_played == 8
        # per-role counters track the OPPONENT's role
        assert ea.games_vs_recent == 8 and eb.games_vs_dynamic == 8
        # role Elo columns moved (a beat a recent-fixed opponent)
        assert ea.elo_recent > 1000.0 and eb.elo_dynamic < 1000.0
        h2h = db.read_head_to_head(store.db_path)
        assert h2h[0]["games"] == 8
        hist = db.read_elo_history(store.db_path)
        assert len(hist) == 2

    def test_carry_forward_elo(self, store):
        _, variables = tiny_model()
        a = store.add_entry(variables, architecture="mlp", model_params={},
                            created_epoch=0)
        store.carry_forward_elo(epoch=4)
        store.carry_forward_elo(epoch=5)
        hist = db.read_elo_history(store.db_path)
        assert [h["epoch"] for h in hist] == [4, 5]


@pytest.mark.integration
class TestMatchPlay:
    def test_identical_models_roughly_even(self):
        model, variables = tiny_model()
        res = play_match(
            model, variables, model, variables,
            num_games=8, max_ply=96, chunk_steps=48, seed=1,
        )
        assert res.games == 8
        assert res.wins_a + res.wins_b + res.draws == 8
        assert res.total_plies > 0
        assert 0.0 <= res.score_a <= 1.0
        assert EvalResult.from_match(res).games == 8


class TestEloFloor:
    def test_ratings_clamped_at_floor(self, store):
        _, variables = tiny_model()
        a = store.add_entry(variables, architecture="mlp", model_params={},
                            created_epoch=0)
        b = store.add_entry(variables, architecture="mlp", model_params={},
                            created_epoch=0)
        import keisei_tpu.db.core as dbcore

        dbcore.execute(store.db_path,
                       "UPDATE league_entries SET elo_rating = 500.5 WHERE id = ?",
                       (b.id,))
        # b loses badly with a 500 floor: rating must not sink below it
        new_a, new_b = store.record_result(
            a.id, b.id, epoch=1, wins_a=8, wins_b=0, draws=0, elo_floor=500.0,
        )
        assert new_b == 500.0
        assert store.get_entry(b.id).elo_rating == 500.0
