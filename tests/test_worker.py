"""Sidecar worker: real queue coordination end-to-end (claim -> play ->
record -> done), stale expiry, heartbeats."""

from pathlib import Path

import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent

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


@pytest.mark.integration
class TestWorkerLifecycle:
    """SIGTERM/stop, stale-claim recovery, poison pairings, heartbeat loss
    (reference tournament_runner.py:110-116, :383-401 semantics)."""

    def _enqueue(self, store, n=3, epoch=1):
        entries = store.list_entries()
        pairs = [(entries[i % len(entries)].id,
                  entries[(i + 1) % len(entries)].id, 2, float(n - i))
                 for i in range(n)]
        dbq.enqueue_pairings(store.db_path, 1, pairs, epoch=epoch)

    def test_stop_mid_batch_returns_unplayed_claims(self, setup, monkeypatch):
        """A stop request between pairings must release the remaining
        claims back to 'pending' so another worker can pick them up."""
        store = setup
        self._enqueue(store, 3)
        cfg = LeagueConfig(tournament_enabled=True, tournament_num_envs=2)
        worker = TournamentWorker(
            store.db_path, store.league_dir, config=cfg, worker_id="wstop",
            parallel_matches=2, store=store,
        )

        played = []

        def fake_play(a, b, epoch):
            played.append((a.id, b.id))
            worker.request_stop()
            return {"games": 1, "plies": 10}

        monkeypatch.setattr(worker._tourney, "_play_pairing", fake_play)
        done = worker.run_once()
        assert done == 1
        status = dbq.get_round_status(store.db_path, 1)
        assert status.get("done") == 1
        assert status.get("pending") == 2  # released, not stuck 'playing'
        assert "playing" not in status

    def test_startup_sweep_resets_only_own_claims(self, setup):
        """A restarted worker sweeps ITS stale claims; other workers'
        in-flight claims are untouched."""
        store = setup
        self._enqueue(store, 4)
        mine = dbq.claim_next_pairings_batch(store.db_path, "w-crash", 2)
        theirs = dbq.claim_next_pairings_batch(store.db_path, "w-alive", 2)
        assert len(mine) == 2 and len(theirs) == 2
        swept = dbq.reset_stale_playing(store.db_path, "w-crash")
        assert swept == 2
        status = dbq.get_round_status(store.db_path, 1)
        assert status == {"pending": 2, "playing": 2}

    def test_poison_pairing_marked_done(self, setup, monkeypatch):
        """A pairing that always crashes is marked done (not re-claimed
        forever) and the rest of the batch still plays."""
        store = setup
        self._enqueue(store, 3)
        cfg = LeagueConfig(tournament_enabled=True, tournament_num_envs=2)
        worker = TournamentWorker(
            store.db_path, store.league_dir, config=cfg, worker_id="wpoison",
            parallel_matches=2, store=store,
        )
        calls = []

        def fake_play(a, b, epoch):
            calls.append(1)
            if len(calls) == 1:
                raise RuntimeError("boom")
            return {"games": 1, "plies": 10}

        monkeypatch.setattr(worker._tourney, "_play_pairing", fake_play)
        while worker.run_once():
            pass
        status = dbq.get_round_status(store.db_path, 1)
        assert status == {"done": 3}
        assert worker.pairings_done == 2  # the poison one doesn't count

    def test_run_loop_exits_on_stop(self, setup):
        """run() with an empty queue polls until stop is requested."""
        import threading

        store = setup
        cfg = LeagueConfig(tournament_enabled=True)
        worker = TournamentWorker(
            store.db_path, store.league_dir, config=cfg, worker_id="wloop",
            poll_interval_s=0.05, store=store,
        )
        t = threading.Timer(0.3, worker.request_stop)
        t.start()
        worker.run()  # must return; a hang fails the test via timeout
        t.join()
        health = dbq.get_worker_health(store.db_path)
        assert any(h["worker_id"] == "wloop" for h in health)

    def test_claim_priority_order(self, setup):
        store = setup
        entries = store.list_entries()
        dbq.enqueue_pairings(store.db_path, 1, [
            (entries[0].id, entries[1].id, 2, 1.0),
            (entries[1].id, entries[2].id, 2, 9.0),
            (entries[0].id, entries[2].id, 2, 5.0),
        ], epoch=1)
        batch = dbq.claim_next_pairings_batch(store.db_path, "wprio", 2)
        assert [p["priority"] for p in batch] == [9.0, 5.0]

    def test_heartbeat_staleness(self, setup):
        store = setup
        from keisei_tpu.db import core as dbcore

        dbq.write_worker_heartbeat(store.db_path, "fresh", 1, "cpu", 0)
        dbcore.write_row(store.db_path, "tournament_worker_heartbeat", {
            "worker_id": "stale", "pid": 2, "device": "cpu",
            "last_seen": "2020-01-01T00:00:00Z", "pairings_done": 0,
        }, replace=True)
        dbcore.write_row(store.db_path, "tournament_worker_heartbeat", {
            "worker_id": "garbled", "pid": 3, "device": "cpu",
            "last_seen": "not-a-timestamp", "pairings_done": 0,
        }, replace=True)
        health = {h["worker_id"]: h["is_healthy"]
                  for h in dbq.get_worker_health(store.db_path)}
        assert health == {"fresh": True, "stale": False, "garbled": False}

    def test_dynamic_update_lock_exclusive(self, setup):
        """The cross-process dynamic-training lock is exclusive and only
        its holder can release it (db/queue.py:170-191)."""
        store = setup
        eid = store.list_entries()[0].id
        assert dbq.claim_dynamic_update(store.db_path, eid, "w1")
        assert not dbq.claim_dynamic_update(store.db_path, eid, "w2")
        dbq.release_dynamic_update(store.db_path, eid, "w2")  # not holder
        assert not dbq.claim_dynamic_update(store.db_path, eid, "w2")
        dbq.release_dynamic_update(store.db_path, eid, "w1")
        assert dbq.claim_dynamic_update(store.db_path, eid, "w2")


@pytest.mark.integration
@pytest.mark.slow
class TestWorkerProcessSignals:
    def test_sigterm_clean_exit(self, setup, tmp_path):
        """A real worker process exits cleanly on SIGTERM (reference
        tournament_runner.py:383-401)."""
        import os
        import signal
        import subprocess
        import sys
        import time

        store = setup
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.Popen(
            [sys.executable, "-m", "keisei_tpu.league.worker",
             "--db", store.db_path, "--league-dir", store.league_dir,
             "--worker-id", "wsig"],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        try:
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                health = dbq.get_worker_health(store.db_path)
                if any(h["worker_id"] == "wsig" for h in health):
                    break
                time.sleep(0.5)
            else:
                raise AssertionError("worker never heartbeat")
            proc.send_signal(signal.SIGTERM)
            assert proc.wait(timeout=30) == 0
        finally:
            if proc.poll() is None:
                proc.kill()


class TestCpuFeasibilityWarning:
    """Round-3 VERDICT weak #8: flagship pairings on a CPU-pinned worker
    must warn loudly instead of silently crawling."""

    def _worker(self, setup):
        return TournamentWorker(setup.db_path, setup.league_dir,
                                worker_id="wcpu", store=setup)

    def _entry(self, setup, blocks, channels):
        e = setup.list_entries()[0]
        return e.__class__(**{**e.__dict__,
                              "architecture": "se_resnet",
                              "model_params": {"num_blocks": blocks,
                                               "channels": channels}})

    def test_flagship_on_cpu_warns_once_per_signature(self, setup, caplog):
        worker = self._worker(setup)
        big = self._entry(setup, 40, 256)   # ~47M params
        import logging
        with caplog.at_level(logging.WARNING, "keisei_tpu.league.worker"):
            worker._warn_if_infeasible_on_cpu(big)
            worker._warn_if_infeasible_on_cpu(big)  # same signature: silent
        hits = [r for r in caplog.records if "CPU feasibility" in r.message]
        assert len(hits) == 1
        assert "b40c256" in hits[0].message

    def test_small_model_on_cpu_is_silent(self, setup, caplog):
        worker = self._worker(setup)
        small = self._entry(setup, 10, 128)  # ~3M params
        import logging
        with caplog.at_level(logging.WARNING, "keisei_tpu.league.worker"):
            worker._warn_if_infeasible_on_cpu(small)
            worker._warn_if_infeasible_on_cpu(setup.list_entries()[0])  # mlp
        assert not [r for r in caplog.records if "CPU feasibility" in r.message]


@pytest.mark.integration
class TestWorkerDevicePlacement:
    """Round-4 VERDICT weak #6: device selection was cpu-or-everything.
    A worker (and the in-process tournament via tournament_device) can now
    take ONE local device — the reference's tournament-on-its-own-GPU
    capability (keisei-500k-league.toml:81-84)."""

    def test_parse_device_specs(self):
        from keisei_tpu.parallel.placement import parse_device

        assert parse_device(None) is None
        assert parse_device("default") is None
        devs = jax.devices()
        assert parse_device("0") is devs[0]
        assert parse_device(3) is devs[3]
        assert parse_device(f"{devs[3].platform}:3") is devs[3]
        with pytest.raises(ValueError, match="out of range"):
            parse_device("99")
        with pytest.raises(ValueError, match="backend"):
            parse_device("cuda:1")

    def test_device_context_pins_default_placement(self):
        from keisei_tpu.parallel.placement import device_context

        dev = jax.devices()[5]
        with device_context("5"):
            x = jnp.zeros((2,)) + 1
            assert x.devices() == {dev}
        with device_context(None):
            y = jnp.zeros((2,)) + 1
            assert y.devices() == {jax.devices()[0]}

    def test_worker_plays_on_pinned_device(self, setup):
        store = setup
        cfg = LeagueConfig(tournament_enabled=True, tournament_num_envs=2,
                           concurrency=ConcurrencyConfig(parallel_matches=1))
        dispatcher = TournamentDispatcher(store, cfg)
        assert dispatcher.enqueue_round(epoch=3) == 3
        worker = TournamentWorker(
            store.db_path, store.league_dir, config=cfg, worker_id="wdev",
            parallel_matches=1, store=store, device="6",
        )
        worker._tourney.config = cfg
        target = jax.devices()[6]
        placements = []
        orig = worker._tourney._play_pairing

        def spy(a, b, epoch):
            placements.append((jnp.zeros(()) + 1).devices())
            return orig(a, b, epoch)

        worker._tourney._play_pairing = spy
        while worker.run_once():
            pass
        assert placements and all(p == {target} for p in placements)
        data = db.read_league_data(store.db_path)
        assert len(data["results"]) == 3
        health = dbq.get_worker_health(store.db_path)
        row = [h for h in health if h["worker_id"] == "wdev"][0]
        assert "6" in row["device"] or "6" in str(row)

    def test_tournament_device_round_runs_pinned(self, setup):
        from keisei_tpu.league.tournament import LeagueTournament

        store = setup
        cfg = LeagueConfig(tournament_enabled=True, tournament_num_envs=2,
                           concurrency=ConcurrencyConfig(parallel_matches=1))
        t = LeagueTournament(store, cfg, min_epoch=0, device="7")
        assert t.device is jax.devices()[7]
        stats = t.run_round(epoch=5)
        assert stats["pairings_completed"] >= 1


@pytest.mark.integration
class TestDeadWorkerReclaim:
    """Round-4 VERDICT #8: a worker killed mid-round must not wedge its
    claimed pairings — an idle peer sweeps claims whose owner's heartbeat
    went stale, and the round completes."""

    @pytest.mark.multiprocess
    def test_reclaim_after_real_process_death(self, setup, tmp_path):
        import os
        import subprocess
        import sys
        import textwrap
        import time as _time

        store = setup
        cfg = LeagueConfig(tournament_enabled=True, tournament_num_envs=2,
                           concurrency=ConcurrencyConfig(parallel_matches=1))
        dispatcher = TournamentDispatcher(store, cfg)
        assert dispatcher.enqueue_round(epoch=3) == 3

        # victim: a REAL separate process that claims pairings, heartbeats
        # once, then dies without cleanup (os._exit = SIGKILL semantics)
        victim = tmp_path / "victim.py"
        victim.write_text(textwrap.dedent(f"""
            import os, sys
            sys.path.insert(0, {str(REPO)!r})
            os.environ["JAX_PLATFORMS"] = "cpu"
            from keisei_tpu.db import queue as dbq
            db = {store.db_path!r}
            batch = dbq.claim_next_pairings_batch(db, "victim", 2, None)
            assert batch, "victim claimed nothing"
            dbq.write_worker_heartbeat(db, "victim", os.getpid(), "cpu", 0)
            print(f"CLAIMED {{len(batch)}}", flush=True)
            os._exit(9)
        """))
        out = subprocess.run(
            [sys.executable, str(victim)], capture_output=True, text=True,
            timeout=120)
        assert "CLAIMED 2" in out.stdout, out.stdout + out.stderr
        status = dbq.get_round_status(store.db_path, 1)
        assert status.get("playing", 0) == 2

        # a fresh worker must first find only the 1 unclaimed pairing...
        worker = TournamentWorker(
            store.db_path, store.league_dir, config=cfg, worker_id="rescuer",
            parallel_matches=1, store=store,
        )
        worker._tourney.config = cfg
        assert worker.run_once() == 1
        # ...the victim's claims stay off-limits while its beat is fresh
        assert dbq.reclaim_dead_worker_claims(
            store.db_path, stale_after_s=3600,
            exclude_worker="rescuer") == 0
        # after the victim's heartbeat goes stale they are reclaimed
        _time.sleep(1.1)
        swept = dbq.reclaim_dead_worker_claims(
            store.db_path, stale_after_s=1.0, exclude_worker="rescuer")
        assert swept == 2
        done = 0
        while True:
            got = worker.run_once()
            if not got:
                break
            done += got
        assert done == 2
        assert dbq.get_active_queue_depth(store.db_path) == 0
        data = db.read_league_data(store.db_path)
        assert len(data["results"]) == 3  # the full round completed

    def test_reclaim_never_touches_live_or_own_claims(self, setup):
        store = setup
        cfg = LeagueConfig(tournament_enabled=True, tournament_num_envs=2)
        TournamentDispatcher(store, cfg).enqueue_round(epoch=3)
        batch = dbq.claim_next_pairings_batch(store.db_path, "alive", 2, None)
        assert len(batch) == 2
        dbq.write_worker_heartbeat(store.db_path, "alive", 1, "cpu", 0)
        # live worker's beat is fresh -> untouched
        assert dbq.reclaim_dead_worker_claims(store.db_path, 60.0) == 0
        # even stale, a worker never reclaims its own claims
        assert dbq.reclaim_dead_worker_claims(
            store.db_path, 0.0, exclude_worker="alive") == 0
