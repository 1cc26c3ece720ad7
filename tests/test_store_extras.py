"""OpponentStore surfaces not covered by the lifecycle suites: per-entry
optimizer persistence, protection/training-enabled flags, analytics
helpers (unique opponents, Elo spread), and display-name determinism.

Reference behaviors: opponent_store.py per-entry Adam persistence
(:1225-1301), protection counters, display-name pool (:58-236),
exercised there by tests/test_opponent_store*.py.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from keisei_tpu.league import OpponentStore, Role
from keisei_tpu.league.store import display_name_for, flavour_facts_for
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "league.db"), str(tmp_path / "league"))


def tiny_variables(seed=0):
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    return model.init(
        jax.random.key(seed), jnp.zeros((1, 50, 9, 9), jnp.float32), train=False
    )


def add(store, seed=0, role=Role.DYNAMIC):
    return store.add_entry(
        tiny_variables(seed), architecture="mlp",
        model_params={"hidden_sizes": [16]}, created_epoch=1, role=role,
    )


class TestOptimizerPersistence:
    def test_roundtrip_with_template(self, store):
        e = add(store)
        params = tiny_variables(1)["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        # advance one step so the moments are nonzero (real Adam state)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, opt_state = opt.update(grads, opt_state, params)

        store.save_optimizer(e.id, opt_state)
        e2 = store.get_entry(e.id)
        assert e2.optimizer_path
        restored = store.load_optimizer(e2, template=opt.init(params))
        r_leaves = jax.tree.leaves(restored)
        s_leaves = jax.tree.leaves(opt_state)
        assert len(r_leaves) == len(s_leaves)
        for r, s in zip(r_leaves, s_leaves):
            assert jnp.allclose(jnp.asarray(r), jnp.asarray(s))

    def test_missing_optimizer_returns_none(self, store):
        e = add(store)
        assert store.load_optimizer(store.get_entry(e.id)) is None

    def test_resave_overwrites(self, store):
        e = add(store)
        params = tiny_variables(1)["params"]
        opt = optax.adam(1e-3)
        s0 = opt.init(params)
        store.save_optimizer(e.id, s0)
        grads = jax.tree.map(jnp.ones_like, params)
        _, s1 = opt.update(grads, s0, params)
        store.save_optimizer(e.id, s1)
        restored = store.load_optimizer(store.get_entry(e.id),
                                        template=opt.init(params))
        # count (a step counter in adam state) must reflect the second save
        assert int(jax.tree.leaves(restored)[0]) == int(jax.tree.leaves(s1)[0])


class TestFlags:
    def test_protection_counter(self, store):
        e = add(store)
        store.set_protection(e.id, 3)
        assert store.get_entry(e.id).protection_remaining == 3
        store.set_protection(e.id, 0)
        assert store.get_entry(e.id).protection_remaining == 0

    def test_training_enabled_toggle(self, store):
        e = add(store)
        store.set_training_enabled(e.id, False)
        assert not store.get_entry(e.id).training_enabled
        store.set_training_enabled(e.id, True)
        assert store.get_entry(e.id).training_enabled


class TestAnalyticsHelpers:
    def test_count_unique_opponents_both_seats(self, store):
        a, b, c = add(store, 0), add(store, 1), add(store, 2)
        store.record_result(a.id, b.id, epoch=1, wins_a=1, wins_b=0, draws=0)
        store.record_result(c.id, a.id, epoch=1, wins_a=0, wins_b=1, draws=0)
        # a faced b (as seat A) and c (as seat B): 2 distinct
        assert store.count_unique_opponents(a.id) == 2
        assert store.count_unique_opponents(b.id) == 1
        # repeat matchup does not inflate the count
        store.record_result(a.id, b.id, epoch=2, wins_a=0, wins_b=1, draws=0)
        assert store.count_unique_opponents(a.id) == 2

    def test_elo_spread_lifetime_and_windowed(self, store):
        from keisei_tpu.db import league_tables

        e = add(store)
        for epoch, elo in enumerate([1000.0, 1040.0, 980.0, 1010.0]):
            league_tables.write_elo_history(store.db_path, e.id, epoch, elo)
        assert store.elo_spread(e.id) == pytest.approx(60.0)
        # last-2 window sees only [980, 1010]
        assert store.elo_spread(e.id, window=2) == pytest.approx(30.0)

    def test_elo_spread_degenerate(self, store):
        e = add(store)
        assert store.elo_spread(e.id) == 0.0


class TestDisplayNames:
    def test_deterministic_and_id_varied(self):
        assert display_name_for(7) == display_name_for(7)
        # consecutive ids differ (stem and title strides are co-prime)
        names = {display_name_for(i) for i in range(40)}
        assert len(names) == 40

    def test_flavour_facts_shape(self):
        facts = flavour_facts_for(12, created_epoch=34)
        assert all(len(pair) == 2 for pair in facts)
        assert any("epoch 34" in v for _, v in facts)


class TestTemplateRestorePlacement:
    """Template restores must honor the template's dtype directly (via
    restore_args) instead of replaying the on-disk sharding sidecar — the
    league hot path loads opponents as bf16 inference trees from float32
    saves (reference: opponent cache semantics, opponent_store.py)."""

    def test_load_variables_casts_to_template_dtype(self, store):
        e = add(store)
        f32 = tiny_variables(0)
        bf16_tmpl = jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else jnp.zeros_like(x),
            f32,
        )
        loaded = store.load_variables(e, template=bf16_tmpl)
        for t, l, orig in zip(jax.tree.leaves(bf16_tmpl),
                              jax.tree.leaves(loaded),
                              jax.tree.leaves(f32)):
            assert l.dtype == t.dtype
            assert jnp.allclose(jnp.asarray(l, jnp.float32),
                                jnp.asarray(orig, jnp.float32), atol=0.01)

    def test_load_optimizer_honors_template_dtype(self, store):
        e = add(store)
        params = tiny_variables(0)["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        store.save_optimizer(e.id, opt_state)
        e2 = store.get_entry(e.id)
        tmpl = jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            opt_state,
        )
        restored = store.load_optimizer(e2, template=tmpl)
        for t, r in zip(jax.tree.leaves(tmpl), jax.tree.leaves(restored)):
            if hasattr(t, "dtype"):
                assert r.dtype == t.dtype
