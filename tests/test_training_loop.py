"""Trainer loop integration: config parsing, epochs, checkpoint/resume."""

import dataclasses

import numpy as np
import pytest

from keisei_tpu.training.config import Config, config_from_dict, load_config
from keisei_tpu.training.loop import PlateauScheduler, SelfPlayTrainer

TINY_RAW = {
    "model": {
        "display_name": "tiny",
        "architecture": "mlp",
        "params": {"hidden_sizes": [32]},
    },
    "training": {
        "num_games": 4,
        "max_ply": 24,
        "steps_per_epoch": 8,
        "algorithm": "katago_ppo",
        "checkpoint_interval": 2,
        "checkpoint_dir": "UNSET",
        "use_amp": True,  # torch-only key: accepted + ignored
    },
    "run": {"default_epochs": 2},
}
TINY_RAW["training"]["algorithm_params"] = {
    "batch_size": 16,
    "epochs_per_batch": 1,
    "compile_mode": "default",  # torch-only key: accepted + ignored
}


class TestConfig:
    def test_reference_toml_parses(self):
        cfg = load_config("configs/katago-b40c256.toml")
        assert cfg.model.architecture == "se_resnet"
        assert cfg.model.params["num_blocks"] == 40
        assert cfg.algorithm_params.batch_size == 1024
        assert cfg.training.effective_steps_per_epoch == 128

    def test_unknown_key_rejected(self):
        raw = {"training": {"bogus_key": 1}}
        with pytest.raises(ValueError, match="unknown key 'bogus_key'"):
            config_from_dict(raw)

    def test_unknown_section_rejected(self):
        with pytest.raises(ValueError, match="unknown config sections"):
            config_from_dict({"nonsense": {}})

    def test_torch_keys_ignored(self):
        cfg = config_from_dict(TINY_RAW)
        assert cfg.algorithm_params.batch_size == 16

    def test_bad_arch_rejected(self):
        with pytest.raises(ValueError, match="unknown architecture"):
            config_from_dict({"model": {"architecture": "alexnet"}})


class TestPlateau:
    def test_reduces_after_patience(self):
        s = PlateauScheduler(factor=0.5, patience=2, min_lr=1e-6)
        lr = 1e-3
        lr = s.step(1.0, lr)  # best
        assert lr == 1e-3
        lr = s.step(1.1, lr)
        lr = s.step(1.2, lr)
        assert lr == 1e-3
        lr = s.step(1.3, lr)  # 3rd bad epoch > patience
        assert lr == pytest.approx(5e-4)

    def test_min_lr_floor(self):
        s = PlateauScheduler(factor=0.1, patience=0, min_lr=1e-5)
        lr = 2e-5
        lr = s.step(1.0, lr)
        lr = s.step(2.0, lr)
        assert lr == pytest.approx(1e-5)


@pytest.mark.integration
class TestTrainerEndToEnd:
    def _config(self, tmp_path) -> Config:
        raw = dataclasses.replace  # noqa: F841 (readability)
        import copy

        raw = copy.deepcopy(TINY_RAW)
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        return config_from_dict(raw)

    def test_two_epochs_and_resume(self, tmp_path):
        cfg = self._config(tmp_path)
        sunk = []
        trainer = SelfPlayTrainer(cfg, metrics_sink=sunk.append)
        em1 = trainer.run_epoch()
        em2 = trainer.run_epoch()
        assert em1.epoch == 1 and em2.epoch == 2
        assert np.isfinite(em1.policy_loss)
        assert len(sunk) == 2
        # checkpoint written at epoch 2 (interval=2) — async by default;
        # drain_maintenance is the durability point
        trainer.drain_maintenance()
        path = trainer.latest_checkpoint()
        assert path is not None

        params_before = {
            k: np.asarray(v)
            for k, v in zip(
                range(10**6),
                __import__("jax").tree.leaves(trainer.state.params),
            )
        }
        # fresh trainer resumes from the checkpoint
        trainer2 = SelfPlayTrainer(cfg, metrics_sink=lambda m: None)
        assert trainer2.epoch == 2
        import jax

        for a, b in zip(
            jax.tree.leaves(trainer.state.params), jax.tree.leaves(trainer2.state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        em3 = trainer2.run_epoch()
        assert em3.epoch == 3
        assert params_before is not None


@pytest.mark.integration
class TestTrainerObservability:
    def test_epoch_writes_db(self, tmp_path):
        import copy

        from keisei_tpu import db as kdb

        raw = copy.deepcopy(TINY_RAW)
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        raw["display"] = {"db_path": str(tmp_path / "obs.db"), "moves_per_minute": 30}
        cfg = config_from_dict(raw)
        trainer = SelfPlayTrainer(cfg)
        trainer.run(num_epochs=2)

        db_path = cfg.display.db_path
        st = kdb.read_training_state(db_path)
        assert st is not None
        assert st["model_arch"] == "mlp"
        assert st["current_epoch"] == 2
        assert st["status"] == "stopped"
        assert st["total_epochs"] == 2

        rows = kdb.read_metrics_since(db_path, 0)
        assert len(rows) == 2
        assert rows[0]["epoch"] == 1 and rows[1]["epoch"] == 2
        assert rows[0]["policy_loss"] is not None
        assert rows[0]["episodes_completed"] >= 0

        snaps = kdb.read_game_snapshots(db_path)
        assert len(snaps) == 4  # min(max_snapshot_games, num_games)
        assert snaps[0]["sfen"]  # valid board state
        assert snaps[0]["current_player"] in ("black", "white")


@pytest.mark.integration
class TestTrainerMesh:
    """SPMD data-parallel path over the 8 virtual CPU devices.

    The reference bar is 2 gloo ranks with a post-run weight-equality
    assertion (tests/integration/test_ddp_training.py:32-120); in SPMD the
    equivalent is: env batch sharded over the mesh, params replicated, and
    every device's param shard bit-identical after training.
    """

    def test_two_epochs_sharded(self, tmp_path):
        import copy

        import jax

        raw = copy.deepcopy(TINY_RAW)
        raw["training"]["num_games"] = 8
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        raw["distributed"] = {"num_devices": 8}
        cfg = config_from_dict(raw)

        trainer = SelfPlayTrainer(cfg, metrics_sink=lambda m: None)
        assert trainer.mesh is not None and trainer.mesh.devices.size == 8

        # env batch actually sharded over the data axis
        board = trainer.env_carry[0].board
        assert len(board.sharding.device_set) == 8

        em1 = trainer.run_epoch()
        em2 = trainer.run_epoch()
        assert em2.epoch == 2
        assert np.isfinite(em1.policy_loss) and np.isfinite(em2.policy_loss)

        # params replicated: every device shard identical and finite
        leaf = jax.tree.leaves(trainer.state.params)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == 8
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
        for p in jax.tree.leaves(trainer.state.params):
            assert np.isfinite(np.asarray(p)).all()


class Test46ChannelMode:
    def test_default_observation_mode_trains(self, tmp_path):
        """observation_mode='default' (46 channels) through a full epoch:
        the env emits 46-channel observations and the model must be
        registered at matching obs_channels (fail-fast covers mismatch;
        this covers the happy path end-to-end)."""
        from keisei_tpu.training.config import load_config
        from keisei_tpu.training.loop import SelfPlayTrainer

        cfg = tmp_path / "c.toml"
        cfg.write_text(f"""
[model]
architecture = "mlp"
[model.params]
hidden_sizes = [16]
obs_channels = 46
[training]
num_games = 4
max_ply = 32
steps_per_epoch = 4
observation_mode = "default"
checkpoint_dir = "{tmp_path}/ck/"
[training.algorithm_params]
batch_size = 8
epochs_per_batch = 1
""")
        trainer = SelfPlayTrainer(load_config(str(cfg)))
        assert trainer.num_channels == 46
        em = trainer.run_epoch()
        import numpy as np
        assert np.isfinite(em.policy_loss)


class TestScalarArchitecturesTrain:
    """BASELINE.json acceptance configs 2-3: the resnet (BatchNorm!) and
    transformer scalar baselines must train end-to-end, not just satisfy
    the forward contract."""

    @pytest.mark.integration
    @pytest.mark.parametrize("arch,params", [
        ("resnet", "hidden_size = 16\nnum_layers = 1"),
        ("transformer", "d_model = 32\nnhead = 2\nnum_layers = 1"),
    ])
    def test_one_epoch(self, tmp_path, arch, params):
        from keisei_tpu.training.config import load_config
        from keisei_tpu.training.loop import SelfPlayTrainer

        cfg = tmp_path / "c.toml"
        cfg.write_text(f"""
[model]
architecture = "{arch}"
[model.params]
{params}
[training]
num_games = 4
max_ply = 32
steps_per_epoch = 4
checkpoint_dir = "{tmp_path}/ck/"
[training.algorithm_params]
batch_size = 8
epochs_per_batch = 1
""")
        trainer = SelfPlayTrainer(load_config(str(cfg)))
        em = trainer.run_epoch()
        import numpy as np
        assert np.isfinite(em.policy_loss) and np.isfinite(em.value_loss)


@pytest.mark.integration
class TestTrainerFailFast:
    """Constructor guards (reference fail-fast checks, katago_loop.py:575-598)."""

    def _raw(self, tmp_path):
        import copy

        raw = copy.deepcopy(TINY_RAW)
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        return raw

    def test_obs_channels_mismatch_rejected(self, tmp_path):
        raw = self._raw(tmp_path)
        raw["model"]["params"]["obs_channels"] = 46  # env runs katago=50
        with pytest.raises(ValueError, match="obs_channels"):
            SelfPlayTrainer(config_from_dict(raw))

    def test_league_rejects_non_flax_rollout_forward(self, tmp_path):
        raw = self._raw(tmp_path)
        raw["training"]["rollout_forward"] = "fused"
        raw["league"] = {"enabled": True, "opponents_per_epoch": 2,
                        "storage": {"league_dir": str(tmp_path / "lg")}}
        with pytest.raises(ValueError, match="rollout_forward"):
            SelfPlayTrainer(config_from_dict(raw))

    def test_league_k_must_divide_num_games(self, tmp_path):
        raw = self._raw(tmp_path)
        raw["league"] = {"enabled": True, "opponents_per_epoch": 3,
                        "storage": {"league_dir": str(tmp_path / "lg")}}
        with pytest.raises(ValueError, match="divide"):
            SelfPlayTrainer(config_from_dict(raw))

    def test_learner_entry_falls_back_to_newest_snapshot(self, tmp_path):
        """A reused league_dir with no training_state pointer must attribute
        the learner to the NEWEST snapshot, not the highest-Elo entry
        (loop.py fallback; Elo-ordered pick would corrupt attribution)."""
        import copy

        raw = self._raw(tmp_path)
        raw["league"] = {"enabled": True, "opponents_per_epoch": 2,
                        "snapshot_interval": 1, "epochs_per_seat": 100,
                        "storage": {"league_dir": str(tmp_path / "lg")}}
        cfg = config_from_dict(raw)
        t1 = SelfPlayTrainer(cfg)
        t1.run_epoch()  # snapshot_interval=1: snapshots a second entry
        t1.drain_maintenance()  # snapshot runs on the maintenance worker
        newest = max(t1.store.list_entries(),
                     key=lambda e: (e.created_epoch, e.id))
        # inflate an OLDER entry's Elo so an Elo-ordered pick would differ
        oldest = min(t1.store.list_entries(), key=lambda e: e.id)
        from keisei_tpu.db import core as dbcore

        dbcore.execute(
            t1.store.db_path,
            "UPDATE league_entries SET elo_rating = 4000 WHERE id = ?",
            (oldest.id,),
        )

        t2 = SelfPlayTrainer(config_from_dict(copy.deepcopy(raw)))
        assert t2.learner_entry_id == newest.id


@pytest.mark.integration
class TestRunTeardown:
    def test_run_saves_final_checkpoint_and_stops_observer(self, tmp_path):
        """trainer.run(): epoch loop + unconditional final save + observer
        stop (the reference's teardown, katago_loop.py:1799-1827)."""
        import copy

        from keisei_tpu import db as kdb

        raw = copy.deepcopy(TINY_RAW)
        raw["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        raw["training"]["checkpoint_interval"] = 100  # only the final save
        raw["display"] = {"db_path": str(tmp_path / "obs.db")}
        trainer = SelfPlayTrainer(config_from_dict(raw))
        trainer.run(num_epochs=1)
        path = trainer.latest_checkpoint()
        assert path is not None and path.endswith("epoch_000001")
        st = kdb.read_training_state(str(tmp_path / "obs.db"))
        assert st["status"] == "stopped"
