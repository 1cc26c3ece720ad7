"""Model family tests: contracts, shapes, registry, BN train/eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keisei_tpu.models.base import SPATIAL_ACTION_SPACE, KataGoOutput, ScalarOutput
from keisei_tpu.models.registry import (
    VALID_ARCHITECTURES,
    build_model,
    get_model_contract,
    validate_model_params,
)

TINY = {
    "mlp": {"hidden_sizes": (32,)},
    "resnet": {"hidden_size": 16, "num_layers": 1},
    "transformer": {"d_model": 32, "nhead": 2, "num_layers": 1},
    "se_resnet": {
        "num_blocks": 1, "channels": 16, "se_reduction": 4,
        "global_pool_channels": 8, "policy_channels": 4,
        "value_fc_size": 16, "score_fc_size": 8,
    },
}


def init_and_apply(arch, train=False, batch=2):
    model, cfg = build_model(arch, {**TINY[arch], "dtype": jnp.float32})
    obs = jnp.zeros((batch, 50, 9, 9), jnp.float32)
    variables = model.init(jax.random.key(0), obs, train=False)
    if train and "batch_stats" in variables:
        out, updates = model.apply(
            variables, obs, train=True, mutable=["batch_stats"]
        )
        return out, variables, updates
    out = model.apply(variables, obs, train=train)
    return out, variables, None


class TestContracts:
    def test_registry_names(self):
        assert VALID_ARCHITECTURES == {"mlp", "resnet", "transformer", "se_resnet"}

    @pytest.mark.parametrize("arch", ["mlp", "resnet", "transformer"])
    def test_scalar_contract(self, arch):
        assert get_model_contract(arch) == "scalar"
        out, _, _ = init_and_apply(arch)
        assert isinstance(out, ScalarOutput)
        assert out.policy_logits.shape == (2, SPATIAL_ACTION_SPACE)
        assert out.value.shape == (2, 1)
        assert jnp.all(jnp.abs(out.value) <= 1.0)

    def test_katago_contract(self):
        assert get_model_contract("se_resnet") == "katago"
        out, _, _ = init_and_apply("se_resnet")
        assert isinstance(out, KataGoOutput)
        assert out.policy_logits.shape == (2, 9, 9, 139)
        assert out.value_logits.shape == (2, 3)
        assert out.score_lead.shape == (2, 1)

    def test_bad_obs_shape_rejected(self):
        model, _ = build_model("se_resnet", TINY["se_resnet"])
        with pytest.raises(ValueError, match="expected obs"):
            model.init(jax.random.key(0), jnp.zeros((2, 9, 9, 50)), train=False)

    def test_unknown_arch(self):
        with pytest.raises(ValueError, match="unknown architecture"):
            build_model("alexnet")

    def test_unknown_param_rejected(self):
        with pytest.raises(ValueError, match="unknown model params"):
            validate_model_params("mlp", {"bogus": 1})


class TestBatchNorm:
    def test_train_updates_batch_stats(self):
        model, _ = build_model("se_resnet", {**TINY["se_resnet"], "dtype": jnp.float32})
        obs = jax.random.normal(jax.random.key(1), (4, 50, 9, 9))
        variables = model.init(jax.random.key(0), obs, train=False)
        _, updates = model.apply(variables, obs, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(updates["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )
        assert changed

    def test_eval_is_deterministic(self):
        out1, _, _ = init_and_apply("se_resnet")
        out2, _, _ = init_and_apply("se_resnet")
        assert np.allclose(
            np.asarray(out1.policy_logits), np.asarray(out2.policy_logits)
        )


class TestJit:
    @pytest.mark.parametrize("arch", sorted(VALID_ARCHITECTURES))
    def test_jit_forward(self, arch):
        model, _ = build_model(arch, {**TINY[arch], "dtype": jnp.float32})
        obs = jnp.zeros((2, 50, 9, 9), jnp.float32)
        variables = model.init(jax.random.key(0), obs, train=False)
        fwd = jax.jit(lambda v, o: model.apply(v, o, train=False))
        out = fwd(variables, obs)
        leaves = jax.tree.leaves(out)
        assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in leaves)
