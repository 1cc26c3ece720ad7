"""Topology-change restore: checkpoints are a contract across meshes.

Round-4 VERDICT #4: the reference detects a world-size mismatch on resume
and degrades gracefully (keisei/training/checkpoint.py:111-118); a
pod-targeted framework must do better — save under an 8-device mesh,
restore under 4 and 1 (and the reverse), with parameter equality and a
defined RNG/optimizer policy, and WITHOUT Orbax's "unsafe when restoring
on a different topology" warning (the restore template supplies target
shardings, so the sharding sidecar written at save time is never read).

Policy (docs/ops.md "Topology changes"): params, batch_stats, optimizer
state, and the RNG key all restore EXACTLY on any topology — replicated
state is topology-free by construction (every shard holds the full value),
and the RNG key is data, not a per-device stream. The env/rollout state is
NOT part of the checkpoint (episodes restart at resume), so nothing in a
checkpoint depends on the device count that wrote it.
"""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.models.registry import build_model
from keisei_tpu.parallel.mesh import make_mesh, replicate
from keisei_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from keisei_tpu.training.ppo import KataGoPPOParams, TrainState, make_optimizer

pytestmark = pytest.mark.integration

ARCH = "se_resnet"
PARAMS = {
    "num_blocks": 1, "channels": 8, "se_reduction": 4,
    "global_pool_channels": 4, "policy_channels": 2,
    "value_fc_size": 8, "score_fc_size": 4, "dtype": jnp.float32,
}


def _fresh_state(seed: int = 0):
    model, _ = build_model(ARCH, dict(PARAMS))
    variables = model.init(
        jax.random.key(seed), jnp.zeros((2, 50, 9, 9), jnp.float32), train=False
    )
    opt = make_optimizer(KataGoPPOParams())
    return model, TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=opt.init(variables["params"]),
        step=jnp.int32(7),
    )


def _assert_trees_equal(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.fixture
def no_topology_warning():
    """Fail the test if Orbax's different-topology warning fires."""
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "error", message=".*different topology.*", category=UserWarning
        )
        yield


class TestTopologyChangeRestore:
    @pytest.mark.parametrize("save_dev,restore_dev", [(8, 4), (8, 1), (1, 8),
                                                      (4, 8)])
    def test_save_restore_across_meshes(self, tmp_path, save_dev, restore_dev,
                                        no_topology_warning):
        assert len(jax.devices()) >= 8  # conftest virtual CPU mesh
        model, state = _fresh_state(seed=save_dev)
        mesh_s = make_mesh(save_dev)
        state = replicate(mesh_s, state)
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, state, epoch=3, architecture=ARCH,
                        rng_key=jax.random.key(42))

        # template built under the TARGET mesh — different device count
        _, template = _fresh_state(seed=99)
        mesh_r = make_mesh(restore_dev)
        template = replicate(mesh_r, template)
        restored, meta, rng = load_checkpoint(ck, template, architecture=ARCH)

        assert meta["epoch"] == 3
        # exact parameter/optimizer/step equality — topology-free contract
        _assert_trees_equal(state.params, restored.params)
        _assert_trees_equal(state.batch_stats, restored.batch_stats)
        _assert_trees_equal(state.opt_state, restored.opt_state)
        assert int(restored.step) == 7
        # RNG key is data: restores exactly regardless of topology
        np.testing.assert_array_equal(
            jax.random.key_data(rng), jax.random.key_data(jax.random.key(42))
        )
        # restored leaves live on the TARGET mesh
        leaf = jax.tree.leaves(restored.params)[0]
        assert set(leaf.sharding.device_set) == set(mesh_r.devices.flat)
        # and drive a forward pass under the new topology
        out = model.apply(
            {"params": restored.params, "batch_stats": restored.batch_stats},
            jnp.zeros((2, 50, 9, 9), jnp.float32), train=False,
        )
        assert np.isfinite(np.asarray(out.policy_logits)).all()

    def test_store_loads_are_topology_free(self, tmp_path, no_topology_warning):
        """Template-free league-store restores must not consult the saver's
        sharding sidecar (they come back as host numpy for local placement)."""
        from keisei_tpu.league.store import OpponentStore

        model, state = _fresh_state(seed=1)
        mesh = make_mesh(8)
        variables = replicate(
            mesh, {"params": state.params, "batch_stats": state.batch_stats}
        )
        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))
        jsonable = {k: v for k, v in PARAMS.items() if k != "dtype"}
        entry = store.add_entry(
            variables, architecture=ARCH, model_params=jsonable,
            created_epoch=0, role="recent_fixed",
        )
        store._cache.clear()  # force the disk path
        loaded = store.load_variables(entry)
        for leaf in jax.tree.leaves(loaded):
            assert isinstance(leaf, np.ndarray)
        _assert_trees_equal(variables["params"], loaded["params"])

    def test_optimizer_raw_load_topology_free(self, tmp_path,
                                              no_topology_warning):
        from keisei_tpu.league.store import OpponentStore

        _, state = _fresh_state(seed=2)
        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))
        entry = store.add_entry(
            {"params": replicate(make_mesh(8), state.params)},
            architecture=ARCH,
            model_params={k: v for k, v in PARAMS.items() if k != "dtype"},
            created_epoch=0, role="dynamic",
        )
        store.save_optimizer(entry.id, replicate(make_mesh(8), state.opt_state))
        entry = store.get_entry(entry.id)
        loaded = store.load_optimizer(entry)  # template-free
        _assert_trees_equal(state.opt_state, loaded)
