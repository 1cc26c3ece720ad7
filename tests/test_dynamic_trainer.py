"""Dynamic-entry online training: batch building, gates, weight updates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.league.config import DynamicConfig
from keisei_tpu.league.dynamic_trainer import DynamicTrainer
from keisei_tpu.league.match import play_match
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.models.registry import build_model


@pytest.fixture
def setup(tmp_path):
    store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32), train=False
    )
    entry = store.add_entry(variables, architecture="mlp", model_params={},
                            created_epoch=0, role=Role.DYNAMIC)
    return store, model, variables, entry


def collect_rollout(model, variables, n=4, max_ply=32):
    res, rollout = play_match(
        model, variables, model, variables,
        num_games=n, max_ply=max_ply, chunk_steps=16, seed=2, collect=True,
    )
    return res, rollout


@pytest.mark.integration
class TestDynamicTrainer:
    def test_update_changes_weights(self, setup):
        store, model, variables, entry = setup
        cfg = DynamicConfig(update_every_matches=1, update_epochs_per_batch=1,
                            min_games_before_eviction=0)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=256, contract="scalar")
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        assert trainer.should_update(entry.id)
        before = jax.tree.leaves(store.load_variables(entry))[0]
        ok = trainer.maybe_update(entry, seed=1)
        assert ok
        # weight flushes are async by design: drain before reading the disk
        store.wait_for_flushes()
        e2 = store.get_entry(entry.id)
        assert e2.update_count == 1
        after = jax.tree.leaves(store.load_variables(e2))[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_update_every_matches_gate(self, setup):
        store, model, variables, entry = setup
        cfg = DynamicConfig(update_every_matches=2)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=128)
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        assert not trainer.should_update(entry.id)  # 1 % 2 != 0
        trainer.record_rollout(entry.id, rollout, side="b")
        assert trainer.should_update(entry.id)

    def test_error_circuit_breaker(self, setup):
        store, model, variables, entry = setup
        cfg = DynamicConfig(update_every_matches=1, max_consecutive_errors=2)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=128)
        _, rollout = collect_rollout(model, variables)

        def boom(*a, **k):
            raise RuntimeError("injected")

        trainer._update_inner = boom
        for _ in range(2):
            trainer.record_rollout(entry.id, rollout, side="a")
            trainer.maybe_update(entry)
        assert entry.id in trainer.disabled_entries()
        assert not store.get_entry(entry.id).training_enabled
        assert not trainer.should_update(entry.id)

    def test_batch_perspective_weights(self, setup):
        store, model, variables, entry = setup
        trainer = DynamicTrainer(store, model, DynamicConfig(), batch_cap=512)
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        batch = trainer._build_batch(entry.id)
        w = np.asarray(batch["weights"])
        T, N = rollout.actions.shape
        total = T * N
        # side-a transitions are those where the mover seat == a_color:
        # roughly half of all real steps, never more than the unpadded count
        assert 0 < w.sum() <= total
        # value cats only on terminal rows
        cats = np.asarray(batch["value_cats"])
        dones = np.asarray(batch["dones"])
        assert (cats[~dones] == -1).all()

    def test_lost_games_carry_terminal_signal(self, setup):
        """A checkmated entry's buffer must include its final move labelled
        done=True / reward=-1 (negamax mirror). Without the mirror the
        mover filter strips every terminal row of a lost game, so losses
        produce zero advantage and no WDL 'loss' targets — the reference's
        blind spot (match_utils.py:262, dynamic_trainer.py:163-200)."""
        from keisei_tpu.league.match import MatchRollout

        store, model, variables, entry = setup
        trainer = DynamicTrainer(store, model, DynamicConfig(), batch_cap=64)
        T, N, C, A = 4, 1, 50, 11259
        # movers alternate 0,1,0,1; mover 1 mates at t=3 (reward +1 for the
        # last mover). Entry holds color 0 (side a, a_color=0): the loser.
        rollout = MatchRollout(
            obs=jnp.zeros((T, N, C, 81), jnp.float32),
            actions=jnp.zeros((T, N), jnp.int32),
            legal_masks=jnp.ones((T, N, A), bool),
            rewards=jnp.asarray([[0.0], [0.0], [0.0], [1.0]]),
            dones=jnp.asarray([[False], [False], [False], [True]]),
            captured=jnp.full((T, N), 255, jnp.uint8),
            term_reason=jnp.zeros((T, N), jnp.uint8),
            mover_color=jnp.asarray([[0], [1], [0], [1]], jnp.int32),
            a_color=jnp.zeros((N,), jnp.int32),
        )
        trainer.record_rollout(entry.id, rollout, side="a")
        buf = trainer._buffers[entry.id][0]
        # entry rows are t=0 and t=2; t=2 (its last move) carries the loss
        assert buf["dones"].tolist() == [False, True]
        assert buf["rewards"].tolist() == [0.0, -1.0]
        batch = trainer._build_batch(entry.id)
        cats = np.asarray(batch["value_cats"])[:2]
        assert cats.tolist() == [-1, 2]  # non-terminal, then WDL 'loss'
        # the winner's buffer keeps its own +1 terminal row untouched
        trainer.record_rollout(entry.id, rollout, side="b")
        win = trainer._buffers[entry.id][1]
        assert win["dones"].tolist() == [False, True]
        assert win["rewards"].tolist() == [0.0, 1.0]

    def test_mirror_skips_reset_boundaries(self, setup):
        """A done row whose predecessor is itself terminal (auto-reset
        boundary) or same-mover must not leak its outcome backwards."""
        from keisei_tpu.league.match import MatchRollout

        store, model, variables, entry = setup
        trainer = DynamicTrainer(store, model, DynamicConfig(), batch_cap=64)
        T, N, C, A = 3, 1, 50, 11259
        # game 1 ends at t=0 (mover 1 wins); game 2: mover 0 at t=1, then
        # mover 1 mates at t=2. The t=0 terminal must not be rewritten by
        # anything, and t=1 gets the mirror from t=2 only.
        rollout = MatchRollout(
            obs=jnp.zeros((T, N, C, 81), jnp.float32),
            actions=jnp.zeros((T, N), jnp.int32),
            legal_masks=jnp.ones((T, N, A), bool),
            rewards=jnp.asarray([[1.0], [0.0], [1.0]]),
            dones=jnp.asarray([[True], [False], [True]]),
            captured=jnp.full((T, N), 255, jnp.uint8),
            term_reason=jnp.zeros((T, N), jnp.uint8),
            mover_color=jnp.asarray([[1], [0], [1]], jnp.int32),
            a_color=jnp.zeros((N,), jnp.int32),
        )
        trainer.record_rollout(entry.id, rollout, side="a")
        buf = trainer._buffers[entry.id][0]  # entry = color 0 → row t=1 only
        assert buf["dones"].tolist() == [True]
        assert buf["rewards"].tolist() == [-1.0]

    def test_buffers_are_host_resident_and_capped(self, setup):
        """record_rollout compacts to the entry's own transitions, caps at
        batch_cap, and stores numpy (buffering raw device MatchRollouts
        OOMed the chip after a few tournament rounds — regression)."""
        store, model, variables, entry = setup
        trainer = DynamicTrainer(store, model, DynamicConfig(), batch_cap=64)
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        buf = trainer._buffers[entry.id]
        assert len(buf) == 1
        rec = buf[0]
        assert isinstance(rec["obs"], np.ndarray)          # host, not device
        assert all(isinstance(v, np.ndarray) for v in rec.values())
        assert rec["obs"].shape[0] <= 64                   # per-rollout cap
        assert rec["obs"].shape[0] == rec["actions"].shape[0]
        # batch still assembles and pads to cap
        batch = trainer._build_batch(entry.id)
        assert batch["obs"].shape[0] == 64
        w = np.asarray(batch["weights"])
        assert w.sum() == rec["obs"].shape[0]

    def test_light_rollout_counts_match_but_buffers_nothing(self, setup):
        store, model, variables, entry = setup
        trainer = DynamicTrainer(store, model, DynamicConfig(), batch_cap=64)
        _, rollout = play_match(
            model, variables, model, variables,
            num_games=2, max_ply=16, chunk_steps=8, seed=3, collect="light",
        )
        trainer.record_rollout(entry.id, rollout, side="b")
        assert trainer._match_counts[entry.id] == 1
        assert entry.id not in trainer._buffers


class TestChunkPlan:
    """Review r2: a batch_cap that is not a multiple of step_batch must
    still be chunked (never one full-batch fwd+bwd — the flagship OOM)."""

    def test_every_plan_bounded_by_step_batch(self):
        from keisei_tpu.league.dynamic_trainer import _plan_chunks
        for cap in (1, 4, 10, 256, 300, 3000, 4096, 4097, 8191):
            for step in (1, 4, 128, 1024):
                chunks, chunk = _plan_chunks(cap, step)
                assert 1 <= chunk <= min(step, cap), (cap, step, chunks, chunk)
                assert chunks * chunk <= cap
                # drops fewer rows than one chunk per pass
                assert cap - chunks * chunk < chunks or chunks == 1

    def test_exact_multiples_drop_nothing(self):
        from keisei_tpu.league.dynamic_trainer import _plan_chunks
        assert _plan_chunks(4096, 1024) == (4, 1024)
        assert _plan_chunks(1024, 1024) == (1, 1024)
        assert _plan_chunks(512, 1024) == (1, 512)

    def test_non_multiple_regression_case(self):
        from keisei_tpu.league.dynamic_trainer import _plan_chunks
        chunks, chunk = _plan_chunks(3000, 1024)  # the review's repro
        assert chunks == 3 and chunk == 1000      # NOT (1, 3000)

    @pytest.mark.integration
    def test_update_trains_with_non_multiple_cap(self, setup):
        store, model, variables, entry = setup
        cfg = DynamicConfig(update_every_matches=1, update_epochs_per_batch=1,
                            min_games_before_eviction=0)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=100,
                                 step_batch=48, contract="scalar")
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        before = jax.tree.leaves(store.load_variables(entry))[0]
        assert trainer.maybe_update(entry, seed=3)
        store.wait_for_flushes()
        after = jax.tree.leaves(store.load_variables(store.get_entry(entry.id)))[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestOptStateOrdering:
    @pytest.mark.integration
    def test_failed_weight_install_discards_new_moments(self, setup):
        """Review r2: if update_weights rejects the new weights (a prior
        async flush failed), the Adam moments from the discarded step must
        NOT be persisted — moments must never run ahead of the weights."""
        store, model, variables, entry = setup
        cfg = DynamicConfig(update_every_matches=1, update_epochs_per_batch=1,
                            min_games_before_eviction=0,
                            max_consecutive_errors=5)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=128,
                                 contract="scalar")
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        # arm a pending flush failure: the NEXT update_weights call raises
        # before bumping (store surfaces prior async errors there)
        store._flush_errors.append(OSError("disk full"))
        count_before = store.get_entry(entry.id).update_count
        assert not trainer.maybe_update(entry, seed=1)   # counted as error
        assert entry.id not in trainer._opt_states        # moments discarded
        assert store.get_entry(entry.id).update_count == count_before
        # and after the failure is consumed, a clean retry succeeds
        trainer.record_rollout(entry.id, rollout, side="a")
        assert trainer.maybe_update(entry, seed=2)
        assert entry.id in trainer._opt_states


@pytest.mark.integration
class TestKataGoContractUpdate:
    def test_wdl_ce_update_changes_weights(self, tmp_path):
        """The katago-contract loss branch (WDL cross-entropy on valid
        value categories, no score head, reference dynamic_trainer.py:
        288-378) — the mlp fixtures only exercise the scalar branch."""
        from keisei_tpu.league.config import DynamicConfig
        from keisei_tpu.league.dynamic_trainer import DynamicTrainer

        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))
        model, _ = build_model("se_resnet", {
            "num_blocks": 1, "channels": 16, "se_reduction": 4,
            "global_pool_channels": 8, "policy_channels": 4,
            "value_fc_size": 16, "score_fc_size": 8,
        })
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
            train=False,
        )
        entry = store.add_entry(variables, architecture="se_resnet",
                                model_params={}, created_epoch=0,
                                role=Role.DYNAMIC)
        cfg = DynamicConfig(update_every_matches=1, update_epochs_per_batch=1,
                            min_games_before_eviction=0)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=256,
                                 contract="katago")
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        assert trainer.should_update(entry.id)
        before = jax.tree.leaves(store.load_variables(entry))[0]
        assert trainer.maybe_update(entry, seed=3)
        store.wait_for_flushes()
        e2 = store.get_entry(entry.id)
        assert e2.update_count == 1
        after = jax.tree.leaves(store.load_variables(e2))[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.integration
class TestTransferCompressedUpdate:
    """Round-5: the update batch rides the tunnel compressed (f16 obs +
    packed masks), decompressed inside the jitted update."""

    def test_build_batch_is_compressed_and_masks_roundtrip(self, setup):
        store, model, variables, entry = setup
        cfg = DynamicConfig(update_every_matches=1, update_epochs_per_batch=1)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=128,
                                 contract="scalar")
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        host = trainer._buffers[entry.id][0]
        batch = trainer._build_batch(entry.id)
        assert batch["obs"].dtype == jnp.float16
        assert batch["masks"].dtype == jnp.uint8
        A = host["masks"].shape[1]
        assert trainer._num_actions == A
        # exact bitplane roundtrip (the host buffer is the reference)
        unpacked = np.unpackbits(
            np.asarray(batch["masks"]), axis=1, bitorder="little")[:, :A]
        n = host["masks"].shape[0]
        np.testing.assert_array_equal(unpacked[:n].astype(bool),
                                      host["masks"])
        # padding rows (zero-weight) are all-False
        assert not unpacked[n:].any()

    def test_compressed_update_trains(self, setup):
        store, model, variables, entry = setup
        cfg = DynamicConfig(update_every_matches=1, update_epochs_per_batch=1,
                            min_games_before_eviction=0)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=128,
                                 contract="scalar")
        _, rollout = collect_rollout(model, variables)
        trainer.record_rollout(entry.id, rollout, side="a")
        assert trainer.maybe_update(entry, seed=3)
        store.wait_for_flushes()
        assert store.get_entry(entry.id).update_count == 1


@pytest.mark.integration
class TestOptimizerDeviceCache:
    """Moments of the K most-recently-trained entries stay device-resident
    (offload beyond K): most tournament updates skip the host round trip
    that dominated flagship rounds."""

    def _trainer_with_entries(self, tmp_path, cache, n_entries=3):
        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "lg"))
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        entries = []
        for i in range(n_entries):
            v = model.init(jax.random.key(i),
                           jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
            entries.append(store.add_entry(
                v, architecture="mlp", model_params={}, created_epoch=0,
                role=Role.DYNAMIC))
        cfg = DynamicConfig(update_every_matches=1, update_epochs_per_batch=1,
                            optimizer_device_cache=cache,
                            max_updates_per_round=99)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=128,
                                 contract="scalar")
        v0 = model.init(jax.random.key(9),
                        jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        _, rollout = collect_rollout(model, v0)
        return store, trainer, entries, rollout

    @staticmethod
    def _is_device_tree(tree):
        leaves = [x for x in jax.tree.leaves(tree)
                  if hasattr(x, "shape") and getattr(x, "shape", None) != ()]
        return all(isinstance(x, jax.Array) for x in leaves)

    def test_lru_demotes_past_cache(self, tmp_path):
        store, trainer, entries, rollout = self._trainer_with_entries(
            tmp_path, cache=2)
        for e in entries:
            trainer.record_rollout(e.id, rollout, side="a")
            assert trainer.maybe_update(e, seed=e.id)
        # newest two device-resident, oldest demoted to host numpy
        assert list(trainer._opt_on_device) == [entries[1].id, entries[2].id]
        assert self._is_device_tree(trainer._opt_states[entries[1].id])
        assert self._is_device_tree(trainer._opt_states[entries[2].id])
        demoted = trainer._opt_states[entries[0].id]
        assert any(isinstance(x, np.ndarray)
                   for x in jax.tree.leaves(demoted))
        store.wait_for_flushes()

    def test_cache_zero_offloads_every_update(self, tmp_path):
        store, trainer, entries, rollout = self._trainer_with_entries(
            tmp_path, cache=0)
        e = entries[0]
        trainer.record_rollout(e.id, rollout, side="a")
        assert trainer.maybe_update(e, seed=1)
        assert any(isinstance(x, np.ndarray)
                   for x in jax.tree.leaves(trainer._opt_states[e.id]))
        store.wait_for_flushes()

    def test_drop_entry_clears_device_lru(self, tmp_path):
        store, trainer, entries, rollout = self._trainer_with_entries(
            tmp_path, cache=2)
        e = entries[0]
        trainer.record_rollout(e.id, rollout, side="a")
        assert trainer.maybe_update(e, seed=1)
        assert e.id in trainer._opt_on_device
        trainer.drop_entry(e.id)
        assert e.id not in trainer._opt_on_device
        assert e.id not in trainer._opt_states
        store.wait_for_flushes()


@pytest.mark.integration
class TestPerRoundUpdateCap:
    def test_cap_blocks_until_begin_round(self, tmp_path):
        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "lg"))
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        cfg = DynamicConfig(update_every_matches=1, update_epochs_per_batch=1,
                            max_updates_per_round=1)
        trainer = DynamicTrainer(store, model, cfg, batch_cap=128,
                                 contract="scalar")
        entries = []
        for i in range(2):
            v = model.init(jax.random.key(i),
                           jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
            entries.append(store.add_entry(
                v, architecture="mlp", model_params={}, created_epoch=0,
                role=Role.DYNAMIC))
        v0 = model.init(jax.random.key(9),
                        jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        _, rollout = collect_rollout(model, v0)
        trainer.begin_round()
        for e in entries:
            trainer.record_rollout(e.id, rollout, side="a")
        assert trainer.maybe_update(entries[0], seed=1)
        # budget spent: second entry must wait for the next round
        assert not trainer.should_update(entries[1].id)
        assert not trainer.maybe_update(entries[1], seed=2)
        trainer.begin_round()
        assert trainer.maybe_update(entries[1], seed=2)
        store.wait_for_flushes()
