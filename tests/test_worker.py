"""Sidecar worker: real queue coordination end-to-end (claim -> play ->
record -> done), stale expiry, heartbeats."""

import pytest

import jax
import jax.numpy as jnp

from keisei_tpu import db
from keisei_tpu.db import queue as dbq
from keisei_tpu.league.config import ConcurrencyConfig, LeagueConfig
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.league.tournament import TournamentDispatcher
from keisei_tpu.league.worker import TournamentWorker
from keisei_tpu.models.registry import build_model


@pytest.fixture
def setup(tmp_path):
    store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    for i in range(3):
        v = model.init(jax.random.key(i), jnp.zeros((1, 50, 9, 9), jnp.float32),
                       train=False)
        store.add_entry(v, architecture="mlp",
                        model_params={"hidden_sizes": [16]},
                        created_epoch=0, role=Role.FRONTIER_STATIC)
    return store


@pytest.mark.integration
class TestWorkerEndToEnd:
    def test_claim_play_record_done(self, setup):
        store = setup
        cfg = LeagueConfig(tournament_enabled=True, tournament_num_envs=2)
        dispatcher = TournamentDispatcher(store, cfg)
        n = dispatcher.enqueue_round(epoch=3)
        assert n == 3

        worker = TournamentWorker(
            store.db_path, store.league_dir, config=cfg, worker_id="wtest",
            parallel_matches=2, store=store,
        )
        # worker's tournament uses small matches for test speed
        worker._tourney.config = LeagueConfig(
            tournament_enabled=True, tournament_num_envs=2,
            concurrency=ConcurrencyConfig(parallel_matches=1),
        )
        done = 0
        while True:
            got = worker.run_once()
            if got == 0:
                break
            done += got
        assert done == 3
        assert dbq.get_active_queue_depth(store.db_path) == 0
        data = db.read_league_data(store.db_path)
        assert len(data["results"]) == 3
        health = dbq.get_worker_health(store.db_path)
        assert health and health[0]["worker_id"] == "wtest"
        assert health[0]["pairings_done"] == 3

    def test_stale_pairings_expired(self, setup):
        store = setup
        cfg = LeagueConfig(tournament_enabled=True, max_staleness_epochs=10)
        db.write_training_state(store.db_path, {
            "config_json": "{}", "display_name": "t", "model_arch": "mlp",
            "algorithm_name": "katago_ppo", "started_at": "x",
            "current_epoch": 100,
        })
        entries = store.list_entries()
        dbq.enqueue_pairings(
            store.db_path, 1, [(entries[0].id, entries[1].id, 2, 0.0)], epoch=5,
        )
        worker = TournamentWorker(
            store.db_path, store.league_dir, config=cfg, worker_id="w2",
            store=store,
        )
        assert worker._stale_cutoff() == 90
        assert worker.run_once() == 0  # stale pairing expired, none played
        status = dbq.get_round_status(store.db_path, 1)
        assert status == {"expired": 1}
