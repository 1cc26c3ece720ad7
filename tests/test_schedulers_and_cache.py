"""Plateau LR scheduler semantics, showcase ModelCache LRU behavior, and
model registry degenerate-config rejection.

Reference behaviors pinned: ReduceLROnPlateau mode=min usage
(katago_loop.py:434-451), showcase ModelCache max-2 LRU (inference.py),
arch param validation (model_registry.py:43-83,
tests/test_model_degenerate_configs.py).
"""

import pytest

from keisei_tpu.models.registry import (
    VALID_ARCHITECTURES,
    build_model,
    validate_model_params,
)
from keisei_tpu.training.loop import PlateauScheduler


class TestPlateauScheduler:
    def test_improvement_resets_counter(self):
        s = PlateauScheduler(factor=0.5, patience=2, min_lr=1e-5)
        lr = 1e-3
        lr = s.step(1.0, lr)   # new best
        lr = s.step(1.1, lr)   # bad 1
        lr = s.step(1.2, lr)   # bad 2 (== patience, not yet over)
        assert lr == 1e-3
        lr = s.step(0.9, lr)   # new best -> counter cleared
        lr = s.step(1.0, lr)
        lr = s.step(1.0, lr)
        assert lr == 1e-3      # only 2 bad epochs since the reset

    def test_reduction_after_patience_exceeded(self):
        s = PlateauScheduler(factor=0.5, patience=2, min_lr=1e-5)
        lr = 1e-3
        s.step(1.0, lr)
        for _ in range(2):
            lr = s.step(2.0, lr)
        assert lr == 1e-3
        lr = s.step(2.0, lr)   # bad 3 > patience
        assert lr == 5e-4

    def test_counter_resets_after_reduction(self):
        """torch semantics: a reduction consumes the bad-epoch streak."""
        s = PlateauScheduler(factor=0.5, patience=1, min_lr=1e-5)
        lr = 1e-3
        s.step(1.0, lr)
        lr = s.step(2.0, lr)           # bad 1
        lr = s.step(2.0, lr)           # bad 2 -> reduce, counter := 0
        assert lr == 5e-4
        lr = s.step(2.0, lr)           # bad 1 again (no immediate re-reduce)
        assert lr == 5e-4
        lr = s.step(2.0, lr)           # bad 2 -> reduce again
        assert lr == 2.5e-4

    def test_min_lr_floor(self):
        s = PlateauScheduler(factor=0.1, patience=0, min_lr=1e-5)
        lr = 3e-5
        s.step(1.0, lr)
        lr = s.step(2.0, lr)
        assert lr == 1e-5          # 3e-6 clamped up to the floor
        lr = s.step(2.0, lr)
        assert lr == 1e-5          # stays at the floor

    def test_equal_value_is_not_improvement(self):
        s = PlateauScheduler(factor=0.5, patience=0, min_lr=1e-9)
        lr = 1e-3
        s.step(1.0, lr)
        lr = s.step(1.0, lr)       # equal -> bad epoch -> reduce (patience 0)
        assert lr == 5e-4


class _FakeEntry:
    def __init__(self, eid, update_count=0):
        self.id = eid
        self.update_count = update_count
        self.architecture = "mlp"
        self.model_params = {"hidden_sizes": [16], "obs_channels": 50}


class _FakeStore:
    """Stand-in OpponentStore: counts weight loads per entry."""

    def __init__(self):
        self.entries = {}
        self.loads = []

    def get_entry(self, eid):
        return self.entries[eid]

    def load_variables(self, entry):
        self.loads.append(entry.id)
        import jax
        import jax.numpy as jnp

        model, _ = build_model(entry.architecture, entry.model_params)
        return model.init(jax.random.key(entry.id),
                          jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)


class TestModelCache:
    def _cache(self, n_entries=3, max_size=2):
        from keisei_tpu.showcase.runner import ModelCache

        store = _FakeStore()
        for i in range(1, n_entries + 1):
            store.entries[i] = _FakeEntry(i)
        return ModelCache(store, max_size=max_size), store

    def test_hit_avoids_reload(self):
        cache, store = self._cache()
        a1 = cache.get(1)
        a2 = cache.get(1)
        assert store.loads == [1]
        assert a1 is a2

    def test_lru_evicts_oldest(self):
        cache, store = self._cache(n_entries=3, max_size=2)
        cache.get(1)
        cache.get(2)
        cache.get(1)       # 1 is now most-recent
        cache.get(3)       # evicts 2
        cache.get(1)       # still cached
        assert store.loads == [1, 2, 3]
        cache.get(2)       # was evicted -> reload
        assert store.loads == [1, 2, 3, 2]

    def test_update_count_invalidates(self):
        """A flushed dynamic entry (bumped update_count) must not serve
        stale weights (reference: cache key includes update_count)."""
        cache, store = self._cache()
        cache.get(1)
        store.entries[1].update_count = 5
        cache.get(1)
        assert store.loads == [1, 1]


class TestDegenerateModelConfigs:
    def test_zero_blocks_rejected(self):
        with pytest.raises((ValueError, TypeError)):
            build_model("se_resnet", {"num_blocks": 0, "channels": 16})

    def test_negative_channels_rejected(self):
        with pytest.raises((ValueError, TypeError)):
            build_model("se_resnet", {"num_blocks": 1, "channels": -8})

    def test_unknown_param_lists_valid_keys(self):
        with pytest.raises(ValueError, match="se_resnet"):
            validate_model_params("se_resnet", {"blocks": 4})

    def test_every_arch_builds_with_defaults(self):
        for arch in sorted(VALID_ARCHITECTURES):
            model, cfg = build_model(arch, {})
            assert model is not None, arch

    def test_mlp_empty_hidden_sizes(self):
        # degenerate but legal: a linear policy/value head stack
        import jax
        import jax.numpy as jnp

        model, _ = build_model("mlp", {"hidden_sizes": []})
        v = model.init(jax.random.key(0), jnp.zeros((1, 50, 9, 9)), train=False)
        out = model.apply(v, jnp.zeros((2, 50, 9, 9)), train=False)
        assert out.policy_logits.shape == (2, 11259)
