"""Checkpoint error paths and retention — reference parity for
test_checkpoint_architecture.py / test_checkpoint_optimizer_state.py:
architecture mismatch, SL->RL optimizer skip, shape mismatch rejection,
meta sidecar atomicity, retention pruning with warm-start exemption.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.models.registry import build_model
from keisei_tpu.training.checkpoint import (
    CheckpointError,
    load_checkpoint,
    load_meta,
    save_checkpoint,
)
from keisei_tpu.training.ppo import KataGoPPOParams, TrainState, make_optimizer


def make_state(hidden=16, seed=0):
    model, _ = build_model("mlp", {"hidden_sizes": [hidden]})
    v = model.init(jax.random.key(seed), jnp.zeros((1, 50, 9, 9), jnp.float32),
                   train=False)
    opt = make_optimizer(KataGoPPOParams())
    return TrainState(
        params=v["params"], batch_stats=v.get("batch_stats", {}),
        opt_state=opt.init(v["params"]), step=jnp.int32(0),
    )


class TestCheckpointEdges:
    def test_roundtrip_with_extra_meta(self, tmp_path):
        state = make_state()
        p = str(tmp_path / "ck")
        save_checkpoint(p, state, epoch=7, architecture="mlp",
                        rng_key=jax.random.key(1),
                        extra_meta={"learning_rate": 1e-3, "note": "x"})
        meta = load_meta(p)
        assert meta["epoch"] == 7 and meta["learning_rate"] == 1e-3
        restored, meta2, rng = load_checkpoint(
            p, make_state(seed=9), architecture="mlp")
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # rng key survives the key_data round trip
        k1 = jax.random.uniform(jax.random.key(1))
        k2 = jax.random.uniform(rng)
        assert float(k1) == float(k2)

    def test_architecture_mismatch_rejected(self, tmp_path):
        state = make_state()
        p = str(tmp_path / "ck")
        save_checkpoint(p, state, epoch=1, architecture="mlp",
                        rng_key=jax.random.key(0))
        with pytest.raises(CheckpointError, match="architecture"):
            load_checkpoint(p, state, architecture="se_resnet")

    def test_shape_mismatch_rejected_on_skip_optimizer(self, tmp_path):
        """Same arch name, different params (hidden 16 vs 32): the
        weights-only path must fail loudly, not silently truncate."""
        state16 = make_state(hidden=16)
        p = str(tmp_path / "ck")
        save_checkpoint(p, state16, epoch=1, architecture="mlp",
                        rng_key=jax.random.key(0))
        with pytest.raises(CheckpointError, match="shape"):
            load_checkpoint(p, make_state(hidden=32), architecture="mlp",
                            skip_optimizer=True)

    def test_skip_optimizer_keeps_template_opt_state(self, tmp_path):
        state = make_state()
        # dirty the optimizer state so the restore has something to discard
        dirty = jax.tree.map(lambda x: x, state.opt_state)
        state = state.replace(opt_state=dirty, step=jnp.int32(42))
        p = str(tmp_path / "ck")
        save_checkpoint(p, state, epoch=5, architecture="mlp",
                        rng_key=jax.random.key(0))
        template = make_state(seed=3)
        restored, meta, _ = load_checkpoint(
            p, template, architecture="mlp", skip_optimizer=True)
        # optimizer and step come from the template (fresh), not the save
        assert int(restored.step) == int(template.step) == 0
        t_leaves = jax.tree.leaves(template.opt_state)
        r_leaves = jax.tree.leaves(restored.opt_state)
        for a, b in zip(t_leaves, r_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_meta_is_clean_error(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_meta(str(tmp_path / "nope"))

    def test_corrupt_meta_is_clean_error(self, tmp_path):
        d = tmp_path / "ck"
        d.mkdir()
        (d / "keisei_meta.json").write_text("{not json")
        with pytest.raises(json.JSONDecodeError):
            load_meta(str(d))


@pytest.mark.integration
class TestRetention:
    def _trainer(self, tmp_path, keep):
        from keisei_tpu.training.config import config_from_dict
        from keisei_tpu.training.loop import SelfPlayTrainer

        cfg = config_from_dict({
            "model": {"architecture": "mlp", "params": {"hidden_sizes": [16]}},
            "training": {
                "num_games": 2, "max_ply": 16, "steps_per_epoch": 4,
                "checkpoint_interval": 1, "checkpoint_keep": keep,
                "checkpoint_dir": str(tmp_path / "ck"),
                "algorithm_params": {"batch_size": 5, "epochs_per_batch": 1},
            },
            "run": {"default_epochs": 1},
        })
        return SelfPlayTrainer(cfg)

    def test_prune_keeps_newest_and_warmstarts(self, tmp_path):
        trainer = self._trainer(tmp_path, keep=2)
        # a warm-start checkpoint must survive pruning forever
        seed_dir = tmp_path / "ck" / "sl_seed"
        seed_dir.mkdir(parents=True)
        (seed_dir / "keisei_meta.json").write_text(
            json.dumps({"epoch": 0, "architecture": "mlp", "phase": "sl"}))
        for _ in range(4):
            trainer.run_epoch()
        trainer.drain_maintenance()  # periodic saves are async by default
        names = sorted(os.listdir(tmp_path / "ck"))
        epochs = [n for n in names if n.startswith("epoch_")]
        assert len(epochs) == 2, f"retention failed: {names}"
        assert epochs == ["epoch_000003", "epoch_000004"]
        assert "sl_seed" in names

    def test_keep_zero_disables_pruning(self, tmp_path):
        trainer = self._trainer(tmp_path, keep=0)
        for _ in range(3):
            trainer.run_epoch()
        trainer.drain_maintenance()  # periodic saves are async by default
        epochs = [n for n in os.listdir(tmp_path / "ck")
                  if n.startswith("epoch_")]
        assert len(epochs) == 3
