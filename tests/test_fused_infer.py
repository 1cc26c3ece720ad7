"""Fused Pallas inference forward == flax eval forward (bf16 tolerance).

Runs the Pallas kernels in interpret mode (CPU test env); the TPU-side
rate measurements live in scripts/profile_pallas_conv*.py and docs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keisei_tpu.models.fused_infer import make_fused_forward
from keisei_tpu.models.registry import build_model
from keisei_tpu.ops.conv3x3 import conv3x3_hwbc, pick_batch_tile


@pytest.fixture(scope="module")
def tiny_model():
    model, cfg = build_model(
        "se_resnet",
        {"num_blocks": 2, "channels": 128, "global_pool_channels": 64},
    )
    rng = jax.random.key(0)
    variables = model.init(rng, jnp.zeros((2, 50, 9, 9), jnp.float32), train=False)

    # perturb batch stats so the BN eval fold is non-trivial
    def perturb(path, a):
        k = jax.random.fold_in(jax.random.key(7), hash(path) % (2**31))
        name = path[-1].key
        if name == "var":
            return jnp.exp(jax.random.normal(k, a.shape) * 0.2)
        if name == "mean":
            return jax.random.normal(k, a.shape) * 0.1
        return a

    stats = jax.tree_util.tree_map_with_path(perturb, variables["batch_stats"])
    return model, cfg, {"params": variables["params"], "batch_stats": stats}


class TestPallasConv:
    def test_matches_xla_conv(self):
        kx, kw = jax.random.split(jax.random.key(3))
        x = jax.random.normal(kx, (8, 9, 9, 64), jnp.float32).astype(jnp.bfloat16)
        w = (jax.random.normal(kw, (3, 3, 64, 64)) * 0.1).astype(jnp.bfloat16)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        got = conv3x3_hwbc(jnp.transpose(x, (1, 2, 0, 3)), w,
                           batch_tile=8, interpret=True)
        got = jnp.transpose(got, (2, 0, 1, 3)).astype(jnp.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)

    def test_rectangular_channels(self):
        kx, kw = jax.random.split(jax.random.key(4))
        x = jax.random.normal(kx, (9, 9, 8, 50)).astype(jnp.bfloat16)
        w = (jax.random.normal(kw, (3, 3, 50, 128)) * 0.1).astype(jnp.bfloat16)
        got = conv3x3_hwbc(x, w, batch_tile=8, interpret=True)
        assert got.shape == (9, 9, 8, 128)
        assert bool(jnp.isfinite(got.astype(jnp.float32)).all())

    def test_pick_batch_tile(self):
        assert pick_batch_tile(1024) == 16  # measured optimum (docs S9)
        assert pick_batch_tile(8) == 8
        assert pick_batch_tile(48, 32) == 24


class TestFusedForward:
    @pytest.mark.parametrize("batch,tile", [(16, 16), (32, 16)])
    def test_matches_flax_eval(self, tiny_model, batch, tile):
        """Multi-grid-step case (32, 16) also exercises scratch border
        persistence across grid iterations."""
        model, cfg, variables = tiny_model
        obs = jax.random.normal(
            jax.random.key(11), (batch, 50, 9, 9), jnp.float32)
        obs = (obs > 0.8).astype(jnp.float32)  # plane-like sparsity

        ref = model.apply(variables, obs, train=False)
        fwd = make_fused_forward(cfg, batch_tile=tile, interpret=True)
        got = fwd(variables, obs)

        assert got.policy_logits.shape == ref.policy_logits.shape
        np.testing.assert_allclose(
            got.policy_logits, ref.policy_logits, rtol=0.1, atol=0.15)
        np.testing.assert_allclose(
            got.value_logits, ref.value_logits, rtol=0.1, atol=0.1)
        np.testing.assert_allclose(
            got.score_lead, ref.score_lead, rtol=0.1, atol=0.1)

        # sampling behavior: argmax agreement on the flat policy. An
        # untrained net's 11k logits are nearly tied, so bf16 rounding can
        # legitimately flip a few argmaxes (order-dependent XLA CPU
        # compilation makes this vary run to run); the allclose checks
        # above are the real numerical pin — this only guards against
        # gross head/layout mix-ups.
        pf = np.asarray(got.policy_logits).reshape(batch, -1)
        rf = np.asarray(ref.policy_logits).reshape(batch, -1)
        agree = (pf.argmax(1) == rf.argmax(1)).mean()
        assert agree >= 0.7, f"top-1 agreement {agree}"


class TestQuantizedForward:
    """int8 trunk (ops/qblock.py) vs the f32 ground-truth flax forward.

    Tolerances are quantization-sized, not bf16-sized: the criterion is
    that int8 error stays in the same band as the production bf16 path.
    """

    @pytest.mark.parametrize("batch,tile", [(32, 32), (64, 32)])
    def test_close_to_f32_truth(self, tiny_model, batch, tile):
        from keisei_tpu.models.fused_infer import make_quantized_forward

        model, cfg, variables = tiny_model
        f32_model, _ = build_model(
            "se_resnet",
            {"num_blocks": 2, "channels": 128, "global_pool_channels": 64,
             "dtype": jnp.float32},
        )
        obs = (jax.random.normal(jax.random.key(21), (batch, 50, 9, 9))
               > 0.8).astype(jnp.float32)

        truth = f32_model.apply(variables, obs, train=False)
        bf16_ref = model.apply(variables, obs, train=False)
        qfwd = make_quantized_forward(cfg, batch_tile=tile, interpret=True)
        got = qfwd(variables, obs)

        t = np.asarray(truth.policy_logits, np.float32).reshape(batch, -1)
        q = np.asarray(got.policy_logits, np.float32).reshape(batch, -1)
        r = np.asarray(bf16_ref.policy_logits, np.float32).reshape(batch, -1)
        scale = np.abs(t).max()
        q_err = np.abs(q - t).max() / scale
        bf_err = np.abs(r - t).max() / scale
        # int8 error within 5x of the bf16 path's own error, and small
        assert q_err < max(5 * bf_err, 0.08), (q_err, bf_err)
        agree = (q.argmax(1) == t.argmax(1)).mean()
        assert agree >= 0.8, f"top-1 agreement vs f32 truth: {agree}"

        v_err = np.abs(np.asarray(got.value_logits)
                       - np.asarray(truth.value_logits)).max()
        v_scale = np.abs(np.asarray(truth.value_logits)).max() + 1e-9
        assert v_err / v_scale < 0.1, v_err

    def test_weight_quantization_roundtrip(self):
        from keisei_tpu.ops.qblock import quantize_conv_weights

        w = jax.random.normal(jax.random.key(2), (3, 3, 64, 64)) * 0.1
        wq, ws = quantize_conv_weights(w)
        assert wq.shape == (3, 192, 64) and wq.dtype == jnp.int8
        # row d holds [W(d,0); W(d,1); W(d,2)] stacked along K
        back = wq.reshape(3, 3, 64, 64).astype(jnp.float32) * ws
        err = float(jnp.abs(back - w).max() / jnp.abs(w).max())
        assert err < 0.01, err  # 1/254 max per-channel rounding error

    def test_pack_unpack_roundtrip(self):
        from keisei_tpu.ops.qblock import pack_quantized, unpack_dequantized

        x = jnp.abs(jax.random.normal(jax.random.key(3), (9, 9, 32, 128)))
        buf, sx = pack_quantized(x, 32)
        assert buf.shape == (145, 32, 384) and buf.dtype == jnp.int8
        # margins are zero: band b is nonzero only on rows [12-b, 133-b)
        assert int(jnp.abs(buf[:10]).max()) == 0
        assert int(jnp.abs(buf[133:]).max()) == 0
        assert int(jnp.abs(buf[:12, :, 0:128]).max()) == 0
        # band consistency: band b at row r equals band 0 at row r+b
        assert jnp.array_equal(buf[12:120, :, 128:256], buf[13:121, :, 0:128])
        assert jnp.array_equal(buf[12:120, :, 256:384], buf[14:122, :, 0:128])
        y = unpack_dequantized(buf, sx, 32)
        err = float(jnp.abs(y - x).max() / jnp.abs(x).max())
        assert err < 0.01, err
