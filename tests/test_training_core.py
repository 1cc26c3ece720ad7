"""Training core tests: GAE semantics, adapters, fused rollout -> update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keisei_tpu.env.vec_env import EnvCore
from keisei_tpu.models.registry import build_model
from keisei_tpu.training.gae import alternating_perspective_overrides, compute_gae
from keisei_tpu.training.ppo import (
    KataGoPPOParams,
    TrainState,
    compute_value_cats,
    get_learning_rate,
    make_optimizer,
    make_ppo_update,
    set_learning_rate,
)
from keisei_tpu.training.rollout import make_selfplay_rollout
from keisei_tpu.training.value_adapter import get_value_adapter


def reference_gae(rewards, values, terminated, next_value, gamma, lam, override=None):
    """Straightforward python GAE for cross-checking (gae.py:59-72 logic)."""
    T, N = rewards.shape
    adv = np.zeros((T, N))
    last = np.zeros(N)
    for t in reversed(range(T)):
        nv = next_value if t == T - 1 else values[t + 1]
        if override is not None:
            nv = np.where(np.isnan(override[t]), nv, override[t])
        nd = 1.0 - terminated[t]
        delta = rewards[t] + gamma * nv * nd - values[t]
        last = delta + gamma * lam * nd * last
        adv[t] = last
    return adv


class TestGAE:
    def test_matches_reference_recurrence(self, rng):
        T, N = 12, 5
        r = rng.normal(size=(T, N)).astype(np.float32)
        v = rng.normal(size=(T, N)).astype(np.float32)
        term = (rng.random((T, N)) < 0.2).astype(np.float32)
        nv = rng.normal(size=N).astype(np.float32)
        ov = np.full((T, N), np.nan, dtype=np.float32)
        ov[3, 1] = 0.7
        ov[7, 2] = -0.3
        got = np.asarray(compute_gae(
            jnp.asarray(r), jnp.asarray(v), jnp.asarray(term), jnp.asarray(nv),
            0.99, 0.95, jnp.asarray(ov),
        ))
        want = reference_gae(r, v, term, nv, 0.99, 0.95, ov)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_chain_cut_stops_truncation_leak(self):
        """A truncated episode (done, not terminated) must bootstrap via
        its override but NOT accumulate the next episode's advantages
        through the gamma*lam chain (the reference GAE leaks here)."""
        gamma, lam = 0.99, 0.95
        r = jnp.array([[0.0], [0.0], [5.0]])
        v = jnp.array([[0.1], [0.2], [0.3]])
        term = jnp.zeros((3, 1))
        dones = jnp.array([[0.0], [1.0], [0.0]])  # truncation at t=1
        ov = jnp.array([[jnp.nan], [0.5], [jnp.nan]])  # -V(terminal) at t=1
        nv = jnp.array([0.4])
        adv = np.asarray(compute_gae(
            r, v, term, nv, gamma, lam, ov, chain_cut=dones))
        # t=2 (next episode): delta = 5 + 0.99*0.4 - 0.3
        d2 = 5.0 + gamma * 0.4 - 0.3
        # t=1: delta uses the override bootstrap; chain to t=2 is CUT
        d1 = 0.0 + gamma * 0.5 - 0.2
        assert adv[1, 0] == pytest.approx(d1, abs=1e-6)
        # t=0 chains within its episode to t=1 as usual
        d0 = 0.0 + gamma * 0.2 - 0.1
        assert adv[0, 0] == pytest.approx(d0 + gamma * lam * d1, abs=1e-6)
        assert adv[2, 0] == pytest.approx(d2, abs=1e-6)

    def test_terminated_blocks_bootstrap(self):
        r = jnp.array([[0.0], [1.0]])
        v = jnp.array([[0.5], [0.2]])
        term = jnp.array([[0.0], [1.0]])
        adv = compute_gae(r, v, term, jnp.array([9.9]), 1.0, 1.0)
        # step 1 terminal: delta = 1 - 0.2 = 0.8; step 0: delta = 0+0.2-0.5
        np.testing.assert_allclose(float(adv[1, 0]), 0.8, rtol=1e-6)
        np.testing.assert_allclose(float(adv[0, 0]), -0.3 + 0.8, rtol=1e-6)

    def test_alternating_overrides(self):
        v = jnp.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        term = jnp.array([[False, True], [False, False], [False, False]])
        ov = jnp.full((3, 2), jnp.nan)
        ov = ov.at[1, 0].set(0.25)  # pre-existing (e.g. truncation) wins
        out = np.asarray(alternating_perspective_overrides(v, term, ov))
        assert out[0, 0] == -3.0  # filled with -values[t+1]
        assert np.isnan(out[0, 1])  # terminal cell untouched
        assert out[1, 0] == 0.25  # existing override preserved
        assert out[1, 1] == -6.0
        assert np.isnan(out[2, 0])  # last row: bootstrap via next_value

    def test_value_cats(self):
        r = jnp.array([1.0, -1.0, 0.0, 0.0])
        term = jnp.array([True, True, True, False])
        cats = np.asarray(compute_value_cats(r, term))
        assert cats.tolist() == [0, 2, 1, -1]


class TestOptimizer:
    def test_lr_injection(self):
        cfg = KataGoPPOParams()
        opt = make_optimizer(cfg)
        params = {"w": jnp.ones(3)}
        st = opt.init(params)
        assert get_learning_rate(st) == pytest.approx(2e-4)
        st = set_learning_rate(st, 1e-5)
        assert get_learning_rate(st) == pytest.approx(1e-5)


@pytest.mark.integration
class TestEndToEnd:
    """Fused rollout -> PPO update, tiny MLP, 4 envs, CPU."""

    def test_rollout_and_update(self):
        N, T = 4, 16
        env_core = EnvCore(num_envs=N, max_ply=32, num_channels=50)
        model, _ = build_model("mlp", {"hidden_sizes": (32,), "dtype": jnp.float32})
        adapter = get_value_adapter("scalar")
        cfg = KataGoPPOParams(batch_size=16, epochs_per_batch=2)

        env_states, obs, mask = env_core.init()
        variables = model.init(
            jax.random.key(0), jnp.zeros((2, 50, 9, 9)), train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt = make_optimizer(cfg)
        state = TrainState(
            params=params, batch_stats=batch_stats,
            opt_state=opt.init(params), step=jnp.int32(0),
        )

        rollout = jax.jit(make_selfplay_rollout(env_core, model, adapter, T))
        update = jax.jit(make_ppo_update(model, adapter, cfg, opt))

        def vars_of(s):
            v = {"params": s.params}
            if s.batch_stats:
                v["batch_stats"] = s.batch_stats
            return v

        carry = (env_states, obs, mask, jax.random.key(1))
        carry, traj, next_value, stats = rollout(vars_of(state), *carry)

        assert traj.obs.shape == (T, N, 50, 81)
        assert traj.actions.shape == (T, N)
        # every stored action was legal under its stored mask
        a = np.asarray(traj.actions).reshape(-1)
        m = np.asarray(traj.legal_masks).reshape(T * N, -1)
        assert m[np.arange(T * N), a].all()
        # log probs are valid
        lp = np.asarray(traj.log_probs)
        assert np.all(np.isfinite(lp)) and np.all(lp <= 0)
        # interior non-terminal cells got alternating overrides
        ov = np.asarray(traj.next_value_override)
        term = np.asarray(traj.terminated)
        interior = ~term[:-1]
        assert np.all(np.isfinite(ov[:-1][interior]))

        old_params = jax.tree.map(np.asarray, state.params)
        state2, metrics = update(state, traj, next_value, jax.random.key(2), 0.01)
        assert int(state2.step) == 1
        for k in ("policy_loss", "value_loss", "entropy", "gradient_norm"):
            assert np.isfinite(float(metrics[k])), k
        changed = any(
            not np.allclose(o, np.asarray(n))
            for o, n in zip(
                jax.tree.leaves(old_params), jax.tree.leaves(state2.params)
            )
        )
        assert changed

    def test_katago_contract_update(self):
        N, T = 4, 8
        env_core = EnvCore(num_envs=N, max_ply=16, num_channels=50)
        model, _ = build_model(
            "se_resnet",
            {"num_blocks": 1, "channels": 16, "se_reduction": 4,
             "global_pool_channels": 8, "policy_channels": 4,
             "value_fc_size": 16, "score_fc_size": 8, "dtype": jnp.float32},
        )
        adapter = get_value_adapter("katago", lambda_value=1.5, lambda_score=0.02)
        cfg = KataGoPPOParams(batch_size=8, epochs_per_batch=1)

        env_states, obs, mask = env_core.init()
        variables = model.init(jax.random.key(0), jnp.zeros((2, 50, 9, 9)), train=False)
        opt = make_optimizer(cfg)
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=opt.init(variables["params"]), step=jnp.int32(0),
        )
        rollout = jax.jit(make_selfplay_rollout(env_core, model, adapter, T))
        update = jax.jit(make_ppo_update(model, adapter, cfg, opt))

        carry = (env_states, obs, mask, jax.random.key(1))
        carry, traj, nv, stats = rollout(
            {"params": state.params, "batch_stats": state.batch_stats}, *carry
        )
        state2, metrics = update(state, traj, nv, jax.random.key(2), 0.01)
        assert np.isfinite(float(metrics["policy_loss"]))
        assert np.isfinite(float(metrics["score_loss"]))
        # batch_stats must have been updated by the train-mode forwards
        bs_changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.batch_stats), jax.tree.leaves(state2.batch_stats)
            )
        )
        assert bs_changed


class TestDistributedContext:
    def test_single_process_default(self):
        from keisei_tpu.parallel.distributed import get_distributed_context

        ctx = get_distributed_context(env={})
        assert not ctx.is_distributed and ctx.is_main

    def test_env_var_parsing(self):
        from keisei_tpu.parallel.distributed import get_distributed_context

        ctx = get_distributed_context(env={
            "KEISEI_COORDINATOR": "10.0.0.1:1234",
            "KEISEI_NUM_PROCESSES": "4",
            "KEISEI_PROCESS_ID": "2",
        })
        assert ctx.is_distributed and not ctx.is_main
        assert ctx.num_processes == 4 and ctx.coordinator == "10.0.0.1:1234"

    def test_auto_mode_and_validation(self):
        import pytest as _pytest

        from keisei_tpu.parallel.distributed import get_distributed_context

        assert get_distributed_context(env={"KEISEI_DISTRIBUTED": "auto"}).is_distributed
        with _pytest.raises(ValueError, match="out of range"):
            get_distributed_context(env={
                "KEISEI_COORDINATOR": "x:1", "KEISEI_NUM_PROCESSES": "2",
                "KEISEI_PROCESS_ID": "5",
            })
