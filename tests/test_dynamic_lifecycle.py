"""DynamicTrainer lifecycle: cache eviction, gates, circuit breakers.

Host-side tests (no device updates) for the paths the integration suite in
tests/test_dynamic_trainer.py exercises only incidentally: drop/retain
cache eviction (ADVICE r1 HBM-growth fix), update-gating arithmetic, rate
limiting, per-entry disable, and the global error-window circuit breaker
(reference dynamic_trainer.py:95-150,259-286 semantics).
"""

import time

import jax.numpy as jnp
import pytest

from keisei_tpu.league.config import DynamicConfig
from keisei_tpu.league.dynamic_trainer import DynamicTrainer
from keisei_tpu.league.store import OpponentStore
from keisei_tpu.models.registry import build_model


@pytest.fixture
def trainer(tmp_path):
    store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))
    model, _ = build_model("mlp", {"hidden_sizes": [8]})
    return DynamicTrainer(store, model, DynamicConfig(update_every_matches=2))


def seed_caches(t, entry_id):
    t._buffers[entry_id] = ["fake-batch"]
    t._opt_states[entry_id] = {"m": jnp.zeros(3)}
    t._match_counts[entry_id] = 5
    t._error_counts[entry_id] = 1
    t._updates_since_flush[entry_id] = 2
    t._disabled.add(entry_id)


class TestCacheLifecycle:
    def test_drop_entry_clears_everything(self, trainer):
        seed_caches(trainer, 7)
        trainer.drop_entry(7)
        assert 7 not in trainer._buffers
        assert 7 not in trainer._opt_states
        assert 7 not in trainer._match_counts
        assert 7 not in trainer._error_counts
        assert 7 not in trainer._updates_since_flush
        assert 7 not in trainer._disabled

    def test_drop_missing_entry_is_noop(self, trainer):
        trainer.drop_entry(999)  # must not raise

    def test_retain_only_sweeps_departed(self, trainer):
        for eid in (1, 2, 3):
            seed_caches(trainer, eid)
        trainer.retain_only({2})
        assert set(trainer._buffers) == {2}
        assert set(trainer._opt_states) == {2}
        # disabled flag for retained entry survives the sweep
        assert trainer._disabled == {2}

    def test_retain_only_sweeps_partial_caches(self, trainer):
        """An entry present in only SOME caches (e.g. opt state flushed but
        buffers pending) is still fully evicted."""
        trainer._opt_states[4] = object()
        trainer._match_counts[5] = 1
        trainer.retain_only(set())
        assert not trainer._opt_states and not trainer._match_counts


class TestGating:
    def test_update_every_matches(self, trainer):
        t = trainer
        assert not t.should_update(1)          # no matches yet
        t._match_counts[1] = 1
        assert not t.should_update(1)          # 1 % 2 != 0
        t._match_counts[1] = 2
        assert t.should_update(1)
        t._match_counts[1] = 4
        assert t.should_update(1)

    def test_training_disabled_config(self, tmp_path):
        store = OpponentStore(str(tmp_path / "l2.db"), str(tmp_path / "lg2"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        t = DynamicTrainer(store, model,
                           DynamicConfig(training_enabled=False,
                                         update_every_matches=1))
        t._match_counts[1] = 1
        assert not t.should_update(1)

    def test_per_entry_disable(self, trainer):
        trainer._match_counts[1] = 2
        trainer._disabled.add(1)
        assert not trainer.should_update(1)
        trainer._match_counts[2] = 2
        assert trainer.should_update(2)  # others unaffected

    def test_rate_limit(self, tmp_path):
        store = OpponentStore(str(tmp_path / "l3.db"), str(tmp_path / "lg3"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        t = DynamicTrainer(store, model,
                           DynamicConfig(update_every_matches=1,
                                         max_updates_per_minute=3))
        t._match_counts[1] = 1
        now = time.monotonic()
        t._recent_update_times.extend([now - 1, now - 2, now - 3])
        assert not t.should_update(1)
        # stale timestamps age out of the 60 s window
        t._recent_update_times.clear()
        t._recent_update_times.extend([now - 120, now - 90, now - 61])
        assert t.should_update(1)

    def test_global_error_circuit_breaker(self, tmp_path):
        store = OpponentStore(str(tmp_path / "l4.db"), str(tmp_path / "lg4"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        t = DynamicTrainer(store, model, DynamicConfig(
            update_every_matches=1, global_error_threshold=3,
            global_error_window_seconds=300.0))
        t._match_counts[1] = 1
        assert t.should_update(1)
        now = time.monotonic()
        t._recent_errors.extend([now - 5, now - 4, now - 3])
        assert not t.should_update(1)          # tripped
        # breaker stays open for the window even if the error list ages
        t._recent_errors.clear()
        assert not t.should_update(1)
        # forcing the window shut re-enables
        t._globally_disabled_until = 0.0
        assert t.should_update(1)

    def test_old_errors_outside_window_ignored(self, tmp_path):
        store = OpponentStore(str(tmp_path / "l5.db"), str(tmp_path / "lg5"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        t = DynamicTrainer(store, model, DynamicConfig(
            update_every_matches=1, global_error_threshold=3,
            global_error_window_seconds=10.0))
        t._match_counts[1] = 1
        now = time.monotonic()
        t._recent_errors.extend([now - 100, now - 90, now - 80])
        assert t.should_update(1)


class TestBatchBuilding:
    def test_empty_buffer_returns_none(self, trainer):
        assert trainer._build_batch(42) is None

    def test_padding_and_cap(self, tmp_path):
        import numpy as np
        store = OpponentStore(str(tmp_path / "l6.db"), str(tmp_path / "lg6"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        t = DynamicTrainer(store, model, DynamicConfig(), batch_cap=8)

        def chunk(n, reward=0.0):
            return {
                "obs": np.zeros((n, 50 * 81), np.float32),
                "actions": np.zeros(n, np.int32),
                "masks": np.ones((n, 11259), bool),
                "rewards": np.full(n, reward, np.float32),
                "dones": np.zeros(n, bool),
            }

        from collections import deque
        # under cap -> zero-padded with zero weights
        t._buffers[1] = deque([chunk(3, reward=1.0)])
        b = t._build_batch(1)
        assert b["obs"].shape[0] == 8
        assert float(b["weights"].sum()) == 3.0
        # over cap -> most recent rows kept, all weights 1
        t._buffers[2] = deque([chunk(6, reward=-1.0), chunk(6, reward=1.0)])
        b2 = t._build_batch(2)
        assert b2["obs"].shape[0] == 8
        assert float(b2["weights"].sum()) == 8.0
        # the survivors are the most recent (reward=1 chunk fully present)
        assert float(jnp.sum(b2["rewards"] == 1.0)) == 6

    def test_value_cats_from_terminal_rewards(self, tmp_path):
        import numpy as np
        from collections import deque
        store = OpponentStore(str(tmp_path / "l7.db"), str(tmp_path / "lg7"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        t = DynamicTrainer(store, model, DynamicConfig(), batch_cap=4)
        c = {
            "obs": np.zeros((4, 50 * 81), np.float32),
            "actions": np.zeros(4, np.int32),
            "masks": np.ones((4, 11259), bool),
            "rewards": np.asarray([1.0, -1.0, 0.0, 0.5], np.float32),
            "dones": np.asarray([True, True, True, False]),
        }
        t._buffers[1] = deque([c])
        b = t._build_batch(1)
        cats = np.asarray(b["value_cats"])
        assert cats.tolist() == [0, 2, 1, -1]  # W, L, draw, non-terminal


class TestCompactTransfer:
    """record_rollout's transfer-compressed fetch: packed masks and f16 obs
    must restore to the buffer's bool/f32 contract, and the per-match cap
    (batch_cap / max_buffer_depth) must bound the fetched rows."""

    def _rollout(self, T=6, N=4, A=11259, seed=0):
        import numpy as np
        from keisei_tpu.league.match import MatchRollout

        rng = np.random.default_rng(seed)
        masks = rng.random((T, N, A)) < 0.1
        return MatchRollout(
            obs=jnp.asarray(rng.random((T, N, 50, 81), np.float32)),
            actions=jnp.asarray(rng.integers(0, A, (T, N)), jnp.int32),
            legal_masks=jnp.asarray(masks),
            rewards=jnp.zeros((T, N), jnp.float32),
            dones=jnp.zeros((T, N), bool),
            captured=jnp.full((T, N), 255, jnp.uint8),
            term_reason=jnp.zeros((T, N), jnp.uint8),
            mover_color=jnp.asarray(
                (np.arange(T)[:, None] + np.arange(N)[None, :]) % 2,
                jnp.int32),
            a_color=jnp.asarray(np.arange(N) % 2, jnp.int32),
        )

    def test_masks_and_obs_roundtrip(self, trainer):
        import numpy as np

        ro = self._rollout()
        trainer.record_rollout(3, ro, "a")
        buf = trainer._buffers[3][-1]
        assert buf["masks"].dtype == bool and buf["obs"].dtype == np.float32
        # recompute the expected mover-filtered rows and compare exactly
        color = np.asarray(ro.a_color)
        mine = np.asarray(ro.mover_color) == color[None, :]
        flat_idx = np.nonzero(mine.reshape(-1))[0]
        T, N = ro.actions.shape
        expect_masks = np.asarray(ro.legal_masks).reshape(T * N, -1)[flat_idx]
        assert (buf["masks"] == expect_masks).all()  # packing is lossless
        expect_obs = np.asarray(ro.obs).reshape(T * N, 50, 81)[flat_idx]
        assert np.allclose(buf["obs"], expect_obs, atol=5e-4)  # f16 transfer

    def test_per_match_fetch_cap(self, tmp_path):
        from keisei_tpu.league.store import OpponentStore

        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "lg"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        t = DynamicTrainer(store, model, DynamicConfig(max_buffer_depth=8),
                           batch_cap=512)
        # 260*4/2 = 520 own-mover rows > the per-match cap
        # max(256, 512/8) = 256; only the newest 256 may be fetched
        ro = self._rollout(T=260, N=4, A=64)
        t.record_rollout(1, ro, "a")
        assert t._buffers[1][-1]["obs"].shape[0] == 256
