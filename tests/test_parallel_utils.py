"""Mesh/sharding helpers, distributed-context edges, compile-cache setup.

Reference model: tests/unit/test_distributed*.py (context parsing, rank
seeding) plus mesh placement invariants the dryrun relies on.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.parallel.distributed import (
    DistributedContext,
    get_distributed_context,
    process_seed,
)
from keisei_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_env_batch,
)
from keisei_tpu.utils.cache import ensure_compile_cache


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == jax.device_count()
        assert mesh.axis_names == ("data",)

    def test_make_mesh_subset(self):
        n = min(4, jax.device_count())
        mesh = make_mesh(n)
        assert mesh.devices.size == n

    def test_make_mesh_too_many_raises(self):
        with pytest.raises(ValueError):
            make_mesh(jax.device_count() + 1)

    def test_shard_env_batch_divides_leading_axis(self):
        n = jax.device_count()
        mesh = make_mesh(n)
        tree = {"a": jnp.arange(n * 4.0).reshape(n * 4), "b": jnp.ones((n * 2, 3))}
        placed = shard_env_batch(mesh, tree)
        for leaf in jax.tree.leaves(placed):
            assert leaf.sharding == batch_sharding(mesh)
            shard_shapes = {s.data.shape for s in leaf.addressable_shards}
            assert len(shard_shapes) == 1  # even split
        np.testing.assert_array_equal(
            np.asarray(placed["a"]), np.arange(n * 4.0)
        )

    def test_replicate_places_full_copy_per_device(self):
        mesh = make_mesh()
        x = replicate(mesh, {"w": jnp.arange(6.0)})["w"]
        assert x.sharding == replicated(mesh)
        for s in x.addressable_shards:
            np.testing.assert_array_equal(np.asarray(s.data), np.arange(6.0))

    def test_scalar_leaves_are_replicated_not_sharded(self):
        # shard_env_batch must not try to split a scalar/0-d leaf
        mesh = make_mesh()
        tree = {"step": jnp.asarray(3), "batch": jnp.ones((jax.device_count(), 2))}
        placed = shard_env_batch(mesh, tree)
        assert int(placed["step"]) == 3


class TestDistributedContextEdges:
    def test_defaults(self):
        ctx = DistributedContext()
        assert ctx.is_main and not ctx.is_distributed

    def test_coordinator_without_process_count_raises(self):
        with pytest.raises(ValueError, match="KEISEI_NUM_PROCESSES"):
            get_distributed_context(env={"KEISEI_COORDINATOR": "host:1234"})

    def test_bad_int_raises(self):
        with pytest.raises(ValueError, match="bad distributed env"):
            get_distributed_context(env={
                "KEISEI_COORDINATOR": "host:1234",
                "KEISEI_NUM_PROCESSES": "two",
            })

    def test_process_id_out_of_range(self):
        with pytest.raises(ValueError, match="out of range"):
            get_distributed_context(env={
                "KEISEI_COORDINATOR": "host:1234",
                "KEISEI_NUM_PROCESSES": "2",
                "KEISEI_PROCESS_ID": "2",
            })

    def test_valid_context(self):
        ctx = get_distributed_context(env={
            "KEISEI_COORDINATOR": "host:1234",
            "KEISEI_NUM_PROCESSES": "4",
            "KEISEI_PROCESS_ID": "3",
        })
        assert ctx.num_processes == 4 and ctx.process_id == 3
        assert ctx.is_distributed and not ctx.is_main

    def test_process_seed_offsets_by_rank(self):
        ctx = DistributedContext(process_id=5, num_processes=8,
                                 coordinator="h:1")
        assert process_seed(100, ctx) == 105
        assert process_seed(100, DistributedContext()) == 100


class TestCompileCache:
    def test_creates_and_sets_env(self, tmp_path, monkeypatch):
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        target = str(tmp_path / "jaxcache")
        got = ensure_compile_cache(target)
        assert got == target
        assert os.path.isdir(target)
        assert os.environ["JAX_COMPILATION_CACHE_DIR"] == target

    def test_honors_existing_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/already/set")
        assert ensure_compile_cache(str(tmp_path / "x")) == "/already/set"
        assert not (tmp_path / "x").exists()

    def test_idempotent(self, tmp_path, monkeypatch):
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        a = ensure_compile_cache(str(tmp_path / "c"))
        b = ensure_compile_cache(str(tmp_path / "other"))
        assert a == b  # second call honors the first


class TestCohortBroadcastContract:
    """broadcast_one_to_all requires every process to contribute a
    structurally IDENTICAL tree; these pins keep the non-main template in
    lockstep with what process 0 actually stacks (a silent divergence
    would deadlock or corrupt the multi-host league broadcast)."""

    def _store_with_entries(self, tmp_path, n=2):
        from keisei_tpu.league.store import OpponentStore, Role
        from keisei_tpu.models.registry import build_model

        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "lg"))
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        variables = None
        entries = []
        for i in range(n):
            v = model.init(jax.random.key(i),
                           jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
            variables = variables or v
            entries.append(store.add_entry(
                v, architecture="mlp", model_params={},
                created_epoch=0, role=Role.DYNAMIC))
        return store, variables, entries

    def test_template_matches_stacked_structure(self, tmp_path):
        from keisei_tpu.league.league_ops import (stack_cohort_variables,
                                                  stacked_cohort_template)

        store, variables, entries = self._store_with_entries(tmp_path)
        stacked = stack_cohort_variables(store, entries, variables,
                                         dtype=jnp.bfloat16)
        template = stacked_cohort_template(variables, len(entries),
                                           dtype=jnp.bfloat16)
        assert (jax.tree.structure(stacked)
                == jax.tree.structure(template))
        for a, b in zip(jax.tree.leaves(stacked), jax.tree.leaves(template)):
            assert a.shape == b.shape
            assert a.dtype == b.dtype

    def test_single_process_broadcast_is_identity(self):
        from keisei_tpu.parallel.distributed import broadcast_from_main

        tree = {"a": jnp.ones((2, 3)), "b": np.arange(4)}
        out = broadcast_from_main(tree, is_source=True)
        assert out is tree  # no numpy round trip, no device shuffle
