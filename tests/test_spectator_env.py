"""SpectatorEnv: single-game display env (no auto-reset, from_sfen, USI)."""

import numpy as np
import pytest

from keisei_tpu.engine.sfen import STARTPOS_SFEN
from keisei_tpu.env.spectator import SpectatorEnv


@pytest.mark.integration
class TestSpectatorEnv:
    def test_initial_state(self):
        env = SpectatorEnv(max_ply=100, action_mode="spatial")
        d = env.to_dict()
        assert d["sfen"] == STARTPOS_SFEN
        assert d["current_player"] == "black"
        assert not env.is_over()
        assert len(env.legal_actions()) == 30  # startpos legal move count
        obs = env.get_observation()
        assert obs.shape == (46, 9, 9) and obs.sum() > 30

    def test_step_and_history(self):
        env = SpectatorEnv(max_ply=100, action_mode="spatial")
        legal = env.legal_moves_with_usi()
        action = next(a for a, usi in legal if usi == "7g7f")
        d = env.step(action)
        assert d["ply"] == 1
        assert d["current_player"] == "white"
        assert d["move_history"] == ["P-7f"]  # Hodges notation
        assert d["reward"] == 0.0 and not d["terminated"]

    def test_illegal_rejected(self):
        env = SpectatorEnv(action_mode="spatial")
        with pytest.raises(ValueError, match="illegal"):
            env.step(0)

    def test_from_sfen_and_flat_mode(self):
        sfen = "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL w - 1"
        env = SpectatorEnv.from_sfen(sfen, max_ply=64, action_mode="default")
        assert env.current_player() == "white"
        assert env.to_sfen() == sfen
        acts = env.legal_actions()
        assert len(acts) == 30
        env.step(acts[0])
        assert env.ply == 1

    def test_from_sfen_invalid_raises(self):
        with pytest.raises(Exception):
            SpectatorEnv.from_sfen("not-a-sfen")

    def test_no_auto_reset_on_mate(self):
        # mate in one: gold drop at 5b supports... use a simple back-rank
        # mate: black rook drops? Construct: white king on 9a, black gold
        # 9c supported... simpler: play a scripted fool's-mate-like sequence
        # is fiddly; instead drive random games until one terminates.
        rng = np.random.default_rng(5)
        env = SpectatorEnv(max_ply=40, action_mode="spatial")
        while not env.is_over():
            acts = env.legal_actions()
            d = env.step(int(rng.choice(acts)))
        assert env.is_over()
        assert d["result"] in ("checkmate", "repetition", "perpetual_check",
                               "impasse", "max_moves")
        assert env.legal_actions() == []
        with pytest.raises(ValueError, match="over"):
            env.step(0)
        env.reset()
        assert not env.is_over() and env.ply == 0


class TestSfenMoveNumber:
    def test_from_sfen_seeds_ply_from_move_counter(self):
        # startpos board at "move 121": ply plane and truncation budget
        # must reflect the real game age (the reference ignores the field,
        # sfen.rs:186 — deliberate fix)
        sfen = ("lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL "
                "b - 121")
        env = SpectatorEnv.from_sfen(sfen, max_ply=200)
        assert int(env._state.ply) == 120

    def test_from_sfen_without_counter_defaults_to_zero(self):
        sfen = ("lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL "
                "b -")
        env = SpectatorEnv.from_sfen(sfen)
        assert int(env._state.ply) == 0

    def test_seeded_game_truncates_at_max_ply_budget(self):
        from keisei_tpu.engine.sfen import parse_sfen_move_number
        assert parse_sfen_move_number("x y z 42") == 42
        assert parse_sfen_move_number("x y z") is None
        assert parse_sfen_move_number("x y z nonsense") is None
        assert parse_sfen_move_number("x y z 0") is None
