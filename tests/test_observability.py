"""TrainingObserver: the trainer-side half of the telemetry protocol.

The dashboard tests validate the server->UI half; these pin the writer —
training_state lifecycle, throttled heartbeats, epoch-summary rate math,
non-fatal failure policy, board snapshots — plus the mesh helpers and the
entropy-coefficient schedule (reference katago_loop.py:1700-1952,
:1886-1909 and distributed.py semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keisei_tpu import db
from keisei_tpu.training.config import config_from_dict
from keisei_tpu.training.observability import TrainingObserver
from keisei_tpu.training.ppo import KataGoPPOParams, entropy_coeff_schedule


@pytest.fixture
def obs(tmp_path):
    return TrainingObserver(str(tmp_path / "o.db"))


def base_em(**kw):
    em = {"epoch": 3, "policy_loss": 0.5, "value_loss": 0.2, "entropy": 4.0,
          "gradient_norm": 1.1, "episodes": 10, "truncated": 2,
          "wins_black": 4, "wins_white": 3, "draws": 1,
          "mean_episode_length": 120.0}
    em.update(kw)
    return em


class TestLifecycle:
    def test_disabled_when_no_db(self):
        o = TrainingObserver("")
        assert not o.enabled
        # every call is a silent no-op
        o.on_start(config_from_dict({}), total_epochs=5)
        o.heartbeat(1, 1, "rollout")
        o.on_epoch(base_em(), step=100)
        o.on_stop()

    def test_on_start_writes_training_state(self, obs):
        cfg = config_from_dict({"model": {"architecture": "mlp"}})
        obs.on_start(cfg, total_epochs=50)
        st = db.read_training_state(obs.db_path)
        assert st["model_arch"] == "mlp"
        assert st["total_epochs"] == 50
        assert st["phase"] == "init"
        assert "num_games" in st["config_json"]

    def test_on_stop_sets_status(self, obs):
        obs.on_start(config_from_dict({}))
        obs.on_stop("crashed")
        assert db.read_training_state(obs.db_path)["status"] == "crashed"


class TestHeartbeat:
    def test_throttled_to_interval(self, obs, monkeypatch):
        obs.on_start(config_from_dict({}))
        import keisei_tpu.training.observability as ob_mod
        t = {"now": 100.0}
        monkeypatch.setattr(ob_mod.time, "monotonic", lambda: t["now"])
        obs._last_heartbeat = 0.0

        obs.heartbeat(1, 10, "rollout")
        st = db.read_training_state(obs.db_path)
        assert (st["current_epoch"], st["phase"]) == (1, "rollout")

        t["now"] = 105.0  # within 10 s window -> suppressed
        obs.heartbeat(2, 20, "update")
        assert db.read_training_state(obs.db_path)["current_epoch"] == 1

        t["now"] = 111.0  # past the window -> written
        obs.heartbeat(2, 20, "update")
        st = db.read_training_state(obs.db_path)
        assert (st["current_epoch"], st["phase"]) == (2, "update")


class TestEpochSummary:
    def test_rate_math(self, obs):
        obs.on_start(config_from_dict({}))
        obs.on_epoch(base_em(), step=384)
        rows = db.read_metrics_since(obs.db_path, 0, 10)
        assert len(rows) == 1
        m = rows[0]
        # 10 episodes, 2 truncated -> 8 decided-or-draw terminations
        assert m["win_rate"] == pytest.approx(7 / 8)
        assert m["black_win_rate"] == pytest.approx(4 / 8)
        assert m["white_win_rate"] == pytest.approx(3 / 8)
        assert m["draw_rate"] == pytest.approx(1 / 8)
        assert m["truncation_rate"] == pytest.approx(2 / 10)
        assert m["step"] == 384

    def test_zero_episode_epoch(self, obs):
        obs.on_start(config_from_dict({}))
        obs.on_epoch(base_em(episodes=0, truncated=0, wins_black=0,
                             wins_white=0, draws=0), step=1)
        m = db.read_metrics_since(obs.db_path, 0, 10)[0]
        assert m["win_rate"] is None
        assert m["truncation_rate"] is None

    def test_write_failure_non_fatal(self, obs, monkeypatch, caplog):
        obs.on_start(config_from_dict({}))
        import keisei_tpu.training.observability as ob_mod

        def boom(*a, **k):
            raise RuntimeError("disk full")

        monkeypatch.setattr(ob_mod.db, "write_epoch_summary", boom)
        import logging
        with caplog.at_level(logging.ERROR):
            obs.on_epoch(base_em(), step=1)  # must not raise
        assert any("epoch summary write failed" in r.message
                   for r in caplog.records)


class TestSnapshots:
    def test_boards_written_from_state(self, obs):
        from keisei_tpu.env.vec_env import EnvCore
        obs.on_start(config_from_dict({}))
        states, _, _ = EnvCore(num_envs=4).init()
        obs.snapshot_envs(states, values=np.asarray([0.1, -0.2, 0.0, 0.5]))
        snaps = db.read_game_snapshots(obs.db_path)
        assert len(snaps) == 4
        s0 = snaps[0]
        assert s0["current_player"] == "black"
        assert s0["ply"] == 0 and s0["is_over"] == 0
        assert s0["sfen"].startswith("lnsgkgsnl/")
        assert s0["value_estimate"] == pytest.approx(0.1)

    def test_cap_respected(self, tmp_path):
        from keisei_tpu.env.vec_env import EnvCore
        o = TrainingObserver(str(tmp_path / "c.db"), max_snapshot_games=2)
        o.on_start(config_from_dict({}))
        o.snapshot_envs(EnvCore(num_envs=8).init()[0])
        assert len(db.read_game_snapshots(o.db_path)) == 2


class TestEntropySchedule:
    def test_warmup_then_decay_then_base(self):
        cfg = KataGoPPOParams(lambda_entropy=0.01, entropy_decay_epochs=10)
        # warmup holds the boosted coefficient
        assert entropy_coeff_schedule(cfg, 0, warmup_epochs=5,
                                      warmup_coeff=0.05) == 0.05
        assert entropy_coeff_schedule(cfg, 4, warmup_epochs=5,
                                      warmup_coeff=0.05) == 0.05
        # linear decay from warmup_coeff to base over decay epochs
        mid = entropy_coeff_schedule(cfg, 10, warmup_epochs=5,
                                     warmup_coeff=0.05)
        assert 0.01 < mid < 0.05
        assert entropy_coeff_schedule(cfg, 5, warmup_epochs=5,
                                      warmup_coeff=0.05) == pytest.approx(0.05)
        # past decay -> base
        assert entropy_coeff_schedule(cfg, 15, warmup_epochs=5,
                                      warmup_coeff=0.05) == pytest.approx(0.01)

    def test_no_warmup_returns_base(self):
        cfg = KataGoPPOParams(lambda_entropy=0.02)
        assert entropy_coeff_schedule(cfg, 0) == 0.02
        assert entropy_coeff_schedule(cfg, 100) == 0.02

    def test_decay_without_warmup_still_decays(self):
        """entropy_decay_epochs must work with warmup disabled (reference
        katago_ppo.py:509-516 decays from warmup_entropy regardless of
        warmup_epochs); the old warmup>0 gate silently ignored it
        (review r2)."""
        cfg = KataGoPPOParams(lambda_entropy=0.01, entropy_decay_epochs=10)
        first = entropy_coeff_schedule(cfg, 0, warmup_epochs=0,
                                       warmup_coeff=0.05)
        mid = entropy_coeff_schedule(cfg, 5, warmup_epochs=0,
                                     warmup_coeff=0.05)
        done = entropy_coeff_schedule(cfg, 10, warmup_epochs=0,
                                      warmup_coeff=0.05)
        assert first == pytest.approx(0.05)
        assert 0.01 < mid < 0.05
        assert done == pytest.approx(0.01)


class TestMeshHelpers:
    def test_make_mesh_and_sharding(self):
        from keisei_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            replicate,
            replicated,
            shard_env_batch,
        )
        mesh = make_mesh(0)  # 0 = all visible (8 virtual CPU devices in tests)
        n = len(jax.devices())
        assert mesh.devices.size == n
        bs = batch_sharding(mesh)
        assert bs.spec[0] == "data"
        x = jnp.zeros((n * 2, 3))
        sharded = shard_env_batch(mesh, {"x": x})["x"]
        assert sharded.sharding.is_equivalent_to(bs, ndim=2)
        r = replicate(mesh, jnp.zeros((4,)))
        assert r.sharding.is_equivalent_to(replicated(mesh), ndim=1)

    def test_mesh_size_validation(self):
        from keisei_tpu.parallel.mesh import make_mesh
        with pytest.raises(ValueError):
            make_mesh(len(jax.devices()) + 1)
