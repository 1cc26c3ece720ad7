"""VecEnv host-shim tests: shapes, contract, episode stats, flat mode."""

import numpy as np
import pytest

from keisei_tpu.engine import types as TY
from keisei_tpu.engine.oracle import OracleGame
from keisei_tpu.env.vec_env import FLAT_TO_SPATIAL, SPATIAL_TO_FLAT, VecEnv


class TestFlatTables:
    def test_roundtrip_valid_entries(self):
        valid = SPATIAL_TO_FLAT < TY.FLAT_ACTION_SPACE
        idx = np.nonzero(valid)[0]
        assert np.array_equal(FLAT_TO_SPATIAL[SPATIAL_TO_FLAT[idx]], idx)

    def test_flat_encoding_matches_reference_formula(self):
        # spatial action: from sq 76 (8,4), slot dir N dist 2 -> to (6,4)=58.
        sq, to = 76, 58
        slot = 0 * 8 + 1  # N, dist 2
        expected = sq * 160 + (to if to < sq else to - 1) * 2 + 0
        assert SPATIAL_TO_FLAT[sq * 139 + slot] == expected

    def test_drop_encoding(self):
        # drop pawn at sq 40: spatial slot 132, flat 12960 + 40*7 + 0
        assert SPATIAL_TO_FLAT[40 * 139 + 132] == 12960 + 40 * 7


@pytest.fixture(scope="module")
def env():
    return VecEnv(num_envs=8, max_ply=64, observation_mode="katago", action_mode="spatial")


class TestVecEnv:
    def test_reset_contract(self, env):
        r = env.reset()
        assert r.observations.shape == (8, 50, 9, 9)
        assert r.observations.dtype == np.float32
        assert r.legal_masks.shape == (8, TY.ACTION_SPACE)
        assert r.legal_masks.sum(axis=1).tolist() == [30] * 8

    def test_step_contract_and_stats(self, env):
        env.reset()
        env.reset_stats()
        rng = np.random.default_rng(0)
        masks = env.reset().legal_masks
        done_seen = 0
        for t in range(70):
            actions = np.array(
                [rng.choice(np.nonzero(masks[i])[0]) for i in range(8)], dtype=np.int64
            )
            res = env.step(actions)
            assert res.observations.shape == (8, 50, 9, 9)
            assert res.current_players.dtype == np.uint8
            assert res.step_metadata.material_balance.shape == (8,)
            masks = res.legal_masks
            done_seen += int((res.terminated | res.truncated).sum())
        # 70 steps with max_ply=64: every env truncated at least once
        assert done_seen >= 8
        assert env.episodes_completed == done_seen
        assert env.mean_episode_length > 0

    def test_illegal_action_rejected(self, env):
        masks = env.reset().legal_masks
        illegal = int(np.nonzero(~masks[0])[0][0])
        actions = np.array([illegal] + [np.nonzero(masks[i])[0][0] for i in range(1, 8)])
        with pytest.raises(ValueError, match="illegal"):
            env.step(actions)

    def test_out_of_range_rejected(self, env):
        env.reset()
        with pytest.raises(ValueError, match="out of range"):
            env.step(np.full(8, TY.ACTION_SPACE, dtype=np.int64))

    def test_get_sfen(self, env):
        env.reset()
        sfen = env.get_sfen(0)
        assert sfen.startswith("lnsgkgsnl/1r5b1/ppppppppp")


class TestFlatMode:
    def test_flat_mode_matches_oracle(self):
        env = VecEnv(num_envs=2, max_ply=32, observation_mode="default", action_mode="default")
        r = env.reset()
        assert r.legal_masks.shape == (2, TY.FLAT_ACTION_SPACE)
        g = OracleGame(max_ply=32)
        # oracle flat mask: encode each legal move through the flat table
        omask = np.zeros(TY.FLAT_ACTION_SPACE, dtype=bool)
        for mv in g.legal_moves():
            omask[SPATIAL_TO_FLAT[g.encode_action(mv)]] = True
        assert np.array_equal(r.legal_masks[0], omask)
        # step through flat ids
        rng = np.random.default_rng(5)
        masks = r.legal_masks
        for _ in range(10):
            actions = np.array(
                [rng.choice(np.nonzero(masks[i])[0]) for i in range(2)], dtype=np.int64
            )
            res = env.step(actions)
            masks = res.legal_masks
        assert masks.shape == (2, TY.FLAT_ACTION_SPACE)
